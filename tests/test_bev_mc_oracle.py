"""Method-independent oracle for the BEV overlap kernel (VERDICT r2 #4).

Both shipped evaluators (tools/kitti-eval/kitti_eval.cpp and
egonet_tpu/eval/kitti_eval.py) share one Sutherland-Hodgman clipping
formulation written by one author, and the reference's Boost.Geometry
backend (evaluate_object_3d_offline_r40.cpp:294-344) cannot be compiled
here (Boost absent) — a correlated misreading of the clipping geometry
would survive the existing C++<->Python cross-checks.  This file checks the
Python kernel against two INDEPENDENT methods that share no clipping code:

  * a Monte-Carlo estimator: uniform points in the AABB-intersection,
    membership by point-in-rotated-rectangle tests (a frame change + two
    absolute-value comparisons — no polygon code at all);
  * closed-form cases: axis-aligned rectangle intersections, the
    square-vs-45deg-square octagon, containment, tangency, slivers,
    rotation/translation invariances.

The C++ twin is covered transitively: test_kitti_eval.py already pins it
to the Python kernel to 1e-6 on randomized multi-class scenes.
"""

import math

import numpy as np
import pytest

from egonet_tpu.eval.kitti_eval import (Obj, bev_corners,
                                        bev_intersection_area,
                                        box3d_overlap, ground_box_overlap)


def make_obj(l, w, ry, t1, t3, h=1.5, t2=1.5):
    return Obj(type="Car", l=l, w=w, h=h, ry=ry, t1=t1, t2=t2, t3=t3)


def _inside(o: Obj, px: np.ndarray, pz: np.ndarray) -> np.ndarray:
    """Point-in-rotated-rect membership, independent of any clipper.

    Inverts bev_corners' frame: corners are R(ry) @ [x_local, z_local] + t
    with R = [[c, s], [-s, c]], so local = R^T (p - t)."""
    c, s = math.cos(o.ry), math.sin(o.ry)
    dx, dz = px - o.t1, pz - o.t3
    lx = c * dx - s * dz
    lz = s * dx + c * dz
    return (np.abs(lx) <= o.l / 2) & (np.abs(lz) <= o.w / 2)


def _mc_intersection(d: Obj, g: Obj, rng, n=60_000):
    """(estimate, 1-sigma) of the BEV intersection via uniform sampling of
    the corner-AABB intersection (a superset of the true intersection)."""
    cd, cg = bev_corners(d), bev_corners(g)
    x1 = max(cd[:, 0].min(), cg[:, 0].min())
    x2 = min(cd[:, 0].max(), cg[:, 0].max())
    z1 = max(cd[:, 1].min(), cg[:, 1].min())
    z2 = min(cd[:, 1].max(), cg[:, 1].max())
    if x2 <= x1 or z2 <= z1:
        return 0.0, 0.0
    area = (x2 - x1) * (z2 - z1)
    px = rng.uniform(x1, x2, n)
    pz = rng.uniform(z1, z2, n)
    hit = _inside(d, px, pz) & _inside(g, px, pz)
    p = hit.mean()
    return area * p, area * math.sqrt(max(p * (1 - p), 1e-12) / n)


def _random_obj(rng, sliver=False):
    l = rng.uniform(0.02, 0.3) if sliver else rng.uniform(0.3, 6.0)
    w = rng.uniform(0.3, 6.0)
    return make_obj(l=l, w=w, ry=rng.uniform(-np.pi, np.pi),
                    t1=rng.normal(0, 2.0), t3=rng.normal(0, 2.0))


def test_bev_intersection_vs_monte_carlo(rng):
    """400 random pairs (incl. slivers): clipper area within 6 sigma of the
    Monte-Carlo estimate, and exactly 0 whenever the AABBs are disjoint."""
    checked_nonzero = 0
    for k in range(400):
        d = _random_obj(rng, sliver=(k % 7 == 0))
        g = _random_obj(rng, sliver=(k % 11 == 0))
        exact = bev_intersection_area(d, g)
        est, sigma = _mc_intersection(d, g, rng)
        if sigma == 0.0:
            assert exact == 0.0, (d, g)
            continue
        assert abs(exact - est) <= 6 * sigma + 1e-4, (d, g, exact, est,
                                                      sigma)
        if exact > 0.05:
            checked_nonzero += 1
    assert checked_nonzero > 100   # the sampler must exercise real overlaps


def test_box3d_overlap_vs_monte_carlo_3d(rng):
    """Full 3D IoU against volumetric Monte-Carlo (y-extent included) on a
    smaller pair budget."""
    for k in range(60):
        d = _random_obj(rng)
        g = _random_obj(rng)
        d.h, d.t2 = rng.uniform(0.5, 2.5), rng.uniform(0.0, 2.0)
        g.h, g.t2 = rng.uniform(0.5, 2.5), rng.uniform(0.0, 2.0)
        y1 = max(d.t2 - d.h, g.t2 - g.h)
        y2 = min(d.t2, g.t2)
        est, sigma = _mc_intersection(d, g, rng)
        inter_vol_est = est * max(0.0, y2 - y1)
        sigma_vol = sigma * max(0.0, y2 - y1)
        union = d.h * d.l * d.w + g.h * g.l * g.w - inter_vol_est
        got = box3d_overlap(d, g, -1)
        if union <= 0 or sigma_vol == 0.0:
            assert got == 0.0 or y2 <= y1
            continue
        assert abs(got - inter_vol_est / union) <= \
            (6 * sigma_vol / max(union, 1e-9) + 1e-4)


def test_axis_aligned_exact(rng):
    """ry=0 boxes reduce to rectangle intersection — closed form, 1e-12."""
    for _ in range(50):
        d = make_obj(l=rng.uniform(0.5, 5), w=rng.uniform(0.5, 5), ry=0.0,
                     t1=rng.uniform(-3, 3), t3=rng.uniform(-3, 3))
        g = make_obj(l=rng.uniform(0.5, 5), w=rng.uniform(0.5, 5), ry=0.0,
                     t1=rng.uniform(-3, 3), t3=rng.uniform(-3, 3))
        ix = max(0.0, min(d.t1 + d.l / 2, g.t1 + g.l / 2)
                 - max(d.t1 - d.l / 2, g.t1 - g.l / 2))
        iz = max(0.0, min(d.t3 + d.w / 2, g.t3 + g.w / 2)
                 - max(d.t3 - d.w / 2, g.t3 - g.w / 2))
        assert bev_intersection_area(d, g) == pytest.approx(ix * iz,
                                                            abs=1e-12)


def test_square_vs_45deg_square_octagon():
    """Unit square vs the same square rotated 45 deg about its center: the
    intersection is the regular octagon of area 2*(sqrt(2)-1) (the square
    minus four corner triangles of legs (1 - 1/sqrt(2)))."""
    d = make_obj(l=1.0, w=1.0, ry=0.0, t1=0.0, t3=0.0)
    g = make_obj(l=1.0, w=1.0, ry=np.pi / 4, t1=0.0, t3=0.0)
    assert bev_intersection_area(d, g) == pytest.approx(
        2 * (np.sqrt(2) - 1), abs=1e-12)


def test_containment_and_identity(rng):
    big = make_obj(l=6, w=4, ry=0.3, t1=1.0, t3=-2.0)
    small = make_obj(l=1, w=0.5, ry=-1.2, t1=1.1, t3=-2.1)
    assert bev_intersection_area(big, small) == pytest.approx(0.5,
                                                              abs=1e-12)
    # identical boxes: IoU exactly 1
    for _ in range(10):
        o = _random_obj(rng)
        o2 = make_obj(l=o.l, w=o.w, ry=o.ry, t1=o.t1, t3=o.t3)
        assert ground_box_overlap(o, o2, -1) == pytest.approx(1.0,
                                                              abs=1e-12)


def test_tangency_is_zero():
    """Boxes sharing exactly one edge intersect in a line — area 0."""
    d = make_obj(l=2.0, w=2.0, ry=0.0, t1=0.0, t3=0.0)
    g = make_obj(l=2.0, w=2.0, ry=0.0, t1=2.0, t3=0.0)
    assert bev_intersection_area(d, g) == pytest.approx(0.0, abs=1e-12)
    assert ground_box_overlap(d, g, -1) == pytest.approx(0.0, abs=1e-12)


def test_rotation_and_translation_invariance(rng):
    """Rotating/translating BOTH boxes by the same rigid motion preserves
    the intersection; ry -> ry + pi preserves the (symmetric) footprint."""
    for _ in range(30):
        d = _random_obj(rng)
        g = _random_obj(rng)
        base = bev_intersection_area(d, g)
        # same-footprint symmetry
        d_pi = make_obj(l=d.l, w=d.w, ry=d.ry + np.pi, t1=d.t1, t3=d.t3)
        assert bev_intersection_area(d_pi, g) == pytest.approx(base,
                                                               rel=1e-9,
                                                               abs=1e-12)
        # rigid motion of the pair
        a = rng.uniform(-np.pi, np.pi)
        tx, tz = rng.normal(0, 5, 2)
        c, s = math.cos(a), math.sin(a)

        def moved(o):
            # bev_corners rotates local points by R(ry) = [[c,s],[-s,c]];
            # composing with the world rotation R(a) gives ry+a and the
            # rotated translation
            nt1 = c * o.t1 + s * o.t3 + tx
            nt3 = -s * o.t1 + c * o.t3 + tz
            return make_obj(l=o.l, w=o.w, ry=o.ry + a, t1=nt1, t3=nt3)

        got = bev_intersection_area(moved(d), moved(g))
        assert got == pytest.approx(base, rel=1e-7, abs=1e-9)


def test_degenerate_zero_dimension_boxes():
    line = make_obj(l=0.0, w=3.0, ry=0.4, t1=0.0, t3=0.0)
    box = make_obj(l=2.0, w=2.0, ry=0.0, t1=0.0, t3=0.0)
    assert bev_intersection_area(box, line) == 0.0
    assert bev_intersection_area(line, box) == 0.0
    assert ground_box_overlap(line, box, -1) == 0.0
