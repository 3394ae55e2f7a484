"""KITTI evaluator tests: overlap kernels vs analytic oracles, protocol
sanity (perfect detections -> AP 100), AOS behaviour, and a C++ <-> Python
cross-check on a randomized scenario."""

import math
import os
import subprocess

import numpy as np
import pytest

from egonet_tpu.eval import kitti_eval as ke

CPP_BIN = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "kitti-eval", "evaluate_object_3d_offline")


def obj(**kw):
    defaults = dict(type="Car", truncation=0.0, occlusion=0, alpha=0.0,
                    x1=0.0, y1=0.0, x2=100.0, y2=60.0,
                    h=1.5, w=1.6, l=3.9, t1=0.0, t2=1.6, t3=20.0, ry=0.0,
                    score=0.9)
    defaults.update(kw)
    return ke.Obj(**defaults)


# ---------------------------------------------------------------- kernels

def test_image_overlap_identity():
    a = obj()
    assert ke.image_box_overlap(a, a) == pytest.approx(1.0)


def test_image_overlap_half():
    a = obj(x1=0, y1=0, x2=100, y2=100)
    b = obj(x1=50, y1=0, x2=150, y2=100)
    # inter 50*100, union 15000
    assert ke.image_box_overlap(a, b) == pytest.approx(5000 / 15000)


def test_bev_overlap_axis_aligned():
    a = obj(l=4.0, w=2.0, t1=0.0, t3=0.0, ry=0.0)
    b = obj(l=4.0, w=2.0, t1=2.0, t3=0.0, ry=0.0)
    # inter = 2x2 = 4, union = 8+8-4 = 12
    assert ke.ground_box_overlap(a, b) == pytest.approx(4 / 12, abs=1e-9)


def test_bev_overlap_rotated_90():
    a = obj(l=4.0, w=2.0, t1=0.0, t3=0.0, ry=0.0)
    b = obj(l=4.0, w=2.0, t1=0.0, t3=0.0, ry=math.pi / 2)
    # two crossed 4x2 rectangles: intersection 2x2 = 4; union 12
    assert ke.ground_box_overlap(a, b) == pytest.approx(4 / 12, abs=1e-6)


def test_bev_overlap_rotated_45_contained():
    # small rotated box fully inside a big one
    a = obj(l=10.0, w=10.0, t1=0.0, t3=0.0, ry=0.0)
    b = obj(l=2.0, w=2.0, t1=0.0, t3=0.0, ry=math.pi / 4)
    inter = ke.bev_intersection_area(a, b)
    assert inter == pytest.approx(4.0, abs=1e-9)


def test_box3d_overlap_with_height():
    a = obj(l=4.0, w=2.0, h=2.0, t2=2.0)
    b = obj(l=4.0, w=2.0, h=2.0, t2=3.0)  # shifted down 1m -> 1m y-overlap
    # same footprint: inter vol = 8*1 = 8; union = 16+16-8 = 24
    assert ke.box3d_overlap(a, b) == pytest.approx(8 / 24, abs=1e-9)


# ---------------------------------------------------------------- protocol

def _gt_line(o):
    return (f"{o.type} {o.truncation:.2f} {o.occlusion} {o.alpha:.2f} "
            f"{o.x1:.2f} {o.y1:.2f} {o.x2:.2f} {o.y2:.2f} "
            f"{o.h:.2f} {o.w:.2f} {o.l:.2f} "
            f"{o.t1:.2f} {o.t2:.2f} {o.t3:.2f} {o.ry:.2f}")


def _det_line(o):
    return _gt_line(o) + f" {o.score:.4f}"


def make_dirs(tmp_path, frames):
    """frames: list of (gts, dets)."""
    gt_dir = tmp_path / "label_2"
    res_dir = tmp_path / "results"
    data_dir = res_dir / "data"
    gt_dir.mkdir(parents=True, exist_ok=True)
    data_dir.mkdir(parents=True, exist_ok=True)
    for i, (gts, dets) in enumerate(frames):
        (gt_dir / f"{i:06d}.txt").write_text(
            "\n".join(_gt_line(g) for g in gts) + "\n")
        (data_dir / f"{i:06d}.txt").write_text(
            "\n".join(_det_line(d) for d in dets) + "\n")
    return str(gt_dir), str(res_dir)


def _spread_gt(n, seed=0):
    """n well-separated cars with distinct scores for the matching dets."""
    rng = np.random.RandomState(seed)
    gts, dets = [], []
    for i in range(n):
        x = 10.0 + 110.0 * i
        g = obj(x1=x, y1=100.0, x2=x + 80.0, y2=160.0,
                t1=-40.0 + 8.0 * i, t3=15.0 + 0.5 * i,
                alpha=float(rng.uniform(-np.pi, np.pi)))
        d = obj(**{**g.__dict__})
        d.score = 1.0 - i * 0.01
        gts.append(g)
        dets.append(d)
    return gts, dets


def test_perfect_detections_ap100(tmp_path):
    frames = []
    for f in range(6):
        gts, dets = _spread_gt(7, seed=f)
        frames.append((gts, dets))
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    results = ke.evaluate(gt_dir, res_dir)
    car = results["car"]
    for metric in ("image", "ground", "3d"):
        for diff in ("easy", "moderate", "hard"):
            assert car[metric][diff]["ap_r40"] == pytest.approx(100.0), \
                (metric, diff)
    # perfect orientations -> AOS == AP
    assert car["image"]["easy"]["aos_r40"] == pytest.approx(100.0)


def test_opposite_orientation_zeroes_aos(tmp_path):
    frames = []
    for f in range(6):
        gts, dets = _spread_gt(7, seed=10 + f)
        for d in dets:
            d.alpha = d.alpha + math.pi  # opposite orientation
        frames.append((gts, dets))
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    results = ke.evaluate(gt_dir, res_dir)
    assert results["car"]["image"]["easy"]["ap_r40"] == pytest.approx(100.0)
    # (1 + cos(pi))/2 = 0 similarity (small residual from the .2f-rounded
    # alpha values in the txt files)
    assert results["car"]["image"]["easy"]["aos_r40"] == pytest.approx(
        0.0, abs=1e-2)


def test_missed_detections_reduce_ap(tmp_path):
    frames = []
    for f in range(6):
        gts, dets = _spread_gt(8, seed=20 + f)
        frames.append((gts, dets[:4]))  # miss half
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    results = ke.evaluate(gt_dir, res_dir)
    ap = results["car"]["image"]["easy"]["ap_r40"]
    assert 30.0 < ap < 60.0  # max recall 0.5


def test_difficulty_gates_clean_data():
    g_clear = obj(occlusion=0, truncation=0.0, y1=100, y2=160)   # 60px
    g_occl = obj(occlusion=2, truncation=0.0, y1=100, y2=160)
    g_trunc = obj(occlusion=0, truncation=0.4, y1=100, y2=160)
    g_small = obj(occlusion=0, truncation=0.0, y1=100, y2=130)   # 30px
    g_van = obj(occlusion=0, truncation=0.0, y1=100, y2=160)
    g_van.type = "Van"
    g_ped = obj(occlusion=0)
    g_ped.type = "Pedestrian"
    gts = [g_clear, g_occl, g_trunc, g_small, g_van, g_ped]
    # easy: only the clear gt counts; occl/trunc/small/van ignored; ped -1
    ig, dc, _, n_gt = ke.clean_data(0, gts, [], difficulty=0)
    assert ig == [0, 1, 1, 1, 1, -1]   # Van: neighbor class -> ignored
    assert n_gt == 1
    # hard: occ<=2, trunc<=0.5, height>=25 all pass
    ig, _, _, n_gt = ke.clean_data(0, gts, [], difficulty=2)
    assert ig == [0, 0, 0, 0, 1, -1]
    assert n_gt == 4
    # detection height gate
    d_small = obj(y1=100, y2=130)
    _, _, igd, _ = ke.clean_data(0, gts, [d_small], difficulty=0)
    assert igd == [1]
    _, _, igd, _ = ke.clean_data(0, gts, [d_small], difficulty=2)
    assert igd == [0]


def test_dontcare_suppresses_fp(tmp_path):
    """A spurious detection inside a DontCare region must not count as FP
    (image metric, criterion inter/det_area)."""
    def build(with_dc):
        frames = []
        for f in range(6):
            gts, dets = _spread_gt(7, seed=40 + f)
            # spurious detection away from every gt
            fp = obj(x1=1000.0, y1=100.0, x2=1080.0, y2=160.0, t1=100.0,
                     t3=80.0)
            fp.score = 0.995  # above all matched scores
            dets = dets + [fp]
            if with_dc:
                dc = ke.Obj(type="DontCare", truncation=-1, occlusion=-1,
                            alpha=-10, x1=990.0, y1=95.0, x2=1090.0,
                            y2=165.0)
                gts = gts + [dc]
            frames.append((gts, dets))
        return frames

    gt_dir, res_dir = make_dirs(tmp_path / "with", build(True))
    ap_with = ke.evaluate(gt_dir, res_dir)["car"]["image"]["easy"]["ap_r40"]
    gt_dir, res_dir = make_dirs(tmp_path / "without", build(False))
    ap_without = ke.evaluate(gt_dir, res_dir)["car"]["image"]["easy"]["ap_r40"]
    assert ap_with == pytest.approx(100.0)
    assert ap_without < ap_with


@pytest.mark.skipif(not os.path.exists(CPP_BIN),
                    reason="C++ evaluator not built")
def test_cpp_matches_python(tmp_path):
    """Randomized noisy scenario: C++ binary curves == Python curves."""
    rng = np.random.RandomState(7)
    frames = []
    for f in range(8):
        gts, dets = _spread_gt(6, seed=100 + f)
        # perturb some detections: noise in box, orientation, misses, extras
        kept = []
        for i, d in enumerate(dets):
            if rng.rand() < 0.15:
                continue  # miss
            d.x1 += rng.uniform(-15, 15)
            d.y1 += rng.uniform(-8, 8)
            d.x2 += rng.uniform(-15, 15)
            d.y2 += rng.uniform(-8, 8)
            d.t1 += rng.uniform(-0.6, 0.6)
            d.t3 += rng.uniform(-0.6, 0.6)
            d.ry += rng.uniform(-0.3, 0.3)
            d.alpha += rng.uniform(-0.4, 0.4)
            d.score = float(rng.uniform(0.3, 1.0))
            kept.append(d)
        # a couple of false positives
        for _ in range(2):
            fp = obj(x1=700 + rng.uniform(0, 200), y1=50,
                     x2=950 + rng.uniform(0, 100), y2=110,
                     t1=rng.uniform(-40, 40), t3=rng.uniform(30, 60))
            fp.score = float(rng.uniform(0.3, 1.0))
            kept.append(fp)
        frames.append((gts, kept))
    gt_dir, res_dir = make_dirs(tmp_path, frames)

    py = ke.evaluate(gt_dir, res_dir, write_stats=False)
    out = subprocess.run([CPP_BIN, gt_dir, res_dir], capture_output=True,
                         text=True, check=True)
    # compare the stats files (written by the C++ binary) with python curves
    for metric, suffix in (("image", "detection"),
                           ("ground", "detection_ground"),
                           ("3d", "detection_3d")):
        path = os.path.join(res_dir, f"stats_car_{suffix}.txt")
        rows = [list(map(float, line.split()))
                for line in open(path).read().splitlines() if line.strip()]
        for diff_idx, diff in enumerate(("easy", "moderate", "hard")):
            np.testing.assert_allclose(
                rows[diff_idx], py["car"][metric][diff]["precision"],
                atol=1e-6, err_msg=f"{metric}/{diff}")
    # AOS cross-check
    path = os.path.join(res_dir, "stats_car_orientation.txt")
    rows = [list(map(float, line.split()))
            for line in open(path).read().splitlines() if line.strip()]
    for diff_idx, diff in enumerate(("easy", "moderate", "hard")):
        np.testing.assert_allclose(rows[diff_idx],
                                   py["car"]["image"][diff]["aos"],
                                   atol=1e-6)


# ------------------------------------------------- neighbor-class semantics

def _ped(**kw):
    d = dict(type="Pedestrian", h=1.8, w=0.6, l=0.9)
    d.update(kw)
    return obj(**d)


def test_van_neighbors_car(tmp_path):
    """A 'Car' detection overlapping a Van GT is NEITHER a TP NOR an FP
    (Van is a neighboring class of Car: clean_data valid_class=0,
    r40.cpp:398-401).  AP stays 100 with the Van detection present; removing
    the Van GT turns the same detection into an FP and drops AP."""
    def build(with_van_gt):
        frames = []
        for f in range(6):
            gts, dets = _spread_gt(7, seed=60 + f)
            van_box = dict(x1=900.0, y1=100.0, x2=990.0, y2=160.0,
                           t1=60.0, t3=25.0)
            van_det = obj(**van_box)
            van_det.score = 0.999          # above every matched score
            dets = dets + [van_det]
            if with_van_gt:
                van = obj(**van_box)
                van.type = "Van"
                gts = gts + [van]
            frames.append((gts, dets))
        return frames

    gt_dir, res_dir = make_dirs(tmp_path / "with", build(True))
    r_with = ke.evaluate(gt_dir, res_dir, write_stats=False)
    gt_dir, res_dir = make_dirs(tmp_path / "without", build(False))
    r_without = ke.evaluate(gt_dir, res_dir, write_stats=False)
    assert r_with["car"]["image"]["easy"]["ap_r40"] == pytest.approx(100.0)
    assert r_without["car"]["image"]["easy"]["ap_r40"] < 100.0
    # the Van GT itself must not add to n_gt: recall base unchanged means
    # the curve cannot dip from a missed Van
    ig, _, _, n_gt = ke.clean_data(
        0, [obj(type="Van")], [], difficulty=2)
    assert ig == [1] and n_gt == 0


def test_person_sitting_neighbors_pedestrian(tmp_path):
    """Person_sitting plays the same ignored-neighbor role for Pedestrian
    (r40.cpp:398-401)."""
    def build(with_ps_gt):
        frames = []
        for f in range(6):
            gts, dets = [], []
            for i in range(7):          # 7 x 6 frames = 42 >= 41 recall pts
                x = 10.0 + 120.0 * i
                g = _ped(x1=x, y1=100.0, x2=x + 40.0, y2=160.0,
                         t1=-30.0 + 10.0 * i, t3=12.0)
                d = _ped(**{**g.__dict__})
                d.score = 1.0 - 0.02 * i
                gts.append(g)
                dets.append(d)
            ps_box = dict(x1=900.0, y1=100.0, x2=940.0, y2=160.0,
                          t1=55.0, t3=14.0)
            ps_det = _ped(**ps_box)
            ps_det.score = 0.999
            dets.append(ps_det)
            if with_ps_gt:
                ps = _ped(**ps_box)
                ps.type = "Person_sitting"
                gts.append(ps)
            frames.append((gts, dets))
        return frames

    gt_dir, res_dir = make_dirs(tmp_path / "with", build(True))
    r_with = ke.evaluate(gt_dir, res_dir, write_stats=False)
    gt_dir, res_dir = make_dirs(tmp_path / "without", build(False))
    r_without = ke.evaluate(gt_dir, res_dir, write_stats=False)
    assert r_with["pedestrian"]["image"]["easy"]["ap_r40"] == \
        pytest.approx(100.0)
    assert r_without["pedestrian"]["image"]["easy"]["ap_r40"] < 100.0


def test_truncation_gating_end_to_end(tmp_path):
    """A GT truncated at 0.2 is ignored at easy (trunc<=0.15) but REQUIRED
    at moderate (<=0.3): missing it costs moderate AP only
    (r40.cpp difficulty gates :43-45)."""
    frames = []
    for f in range(6):
        gts, dets = _spread_gt(7, seed=80 + f)
        trunc_box = dict(x1=900.0, y1=100.0, x2=980.0, y2=160.0,
                         t1=55.0, t3=18.0)
        g = obj(**trunc_box)
        g.truncation = 0.2
        gts = gts + [g]          # never detected
        frames.append((gts, dets))
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    r = ke.evaluate(gt_dir, res_dir, write_stats=False)
    assert r["car"]["image"]["easy"]["ap_r40"] == pytest.approx(100.0)
    assert r["car"]["image"]["moderate"]["ap_r40"] < 100.0


# ------------------------------------------------------------- server mode

def _ped_frames(n_frames=6, bev_shift=0.0):
    """Pedestrian GT/dets whose BEV boxes are shifted by `bev_shift` m."""
    frames = []
    for f in range(n_frames):
        gts, dets = [], []
        for i in range(7):              # 7 x 6 frames = 42 >= 41 recall pts
            x = 10.0 + 120.0 * i
            g = _ped(x1=x, y1=100.0, x2=x + 40.0, y2=160.0,
                     t1=-30.0 + 10.0 * i, t3=12.0)
            d = _ped(**{**g.__dict__})
            d.t1 += bev_shift        # shift along the 0.9m length axis
            d.score = 1.0 - 0.02 * i
            gts.append(g)
            dets.append(d)
        frames.append((gts, dets))
    return frames


def test_server_mode_looser_ped_bev_gate(tmp_path):
    """BEV IoU ~0.38 pedestrian boxes: FP offline (gate 0.5) but TP on the
    server (gate 0.25; evaluate_object_3d.cpp:54)."""
    # 0.9x0.6m boxes shifted 0.4m along length: inter 0.5*0.6=0.3,
    # union 2*0.54-0.3=0.78 -> IoU 0.3846 (between the 0.25 and 0.5 gates)
    frames = _ped_frames(bev_shift=0.4)
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    off = ke.evaluate(gt_dir, res_dir, write_stats=False)
    srv = ke.evaluate(gt_dir, res_dir, write_stats=False, server=True,
                      n_testimages=len(frames))
    assert srv["pedestrian"]["ground"]["easy"]["ap_r40"] == \
        pytest.approx(100.0)
    assert off["pedestrian"]["ground"]["easy"]["ap_r40"] < 50.0
    # image-metric gates are identical in both modes
    assert srv["pedestrian"]["image"]["easy"]["ap_r40"] == \
        pytest.approx(off["pedestrian"]["image"]["easy"]["ap_r40"])


def test_server_mode_requires_all_files(tmp_path):
    frames = _ped_frames(n_frames=4)
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    with pytest.raises(FileNotFoundError):
        ke.evaluate(gt_dir, res_dir, write_stats=False, server=True,
                    n_testimages=5)


@pytest.mark.skipif(not os.path.exists(CPP_BIN),
                    reason="C++ evaluator not built")
def test_cpp_server_mode_matches_python(tmp_path):
    frames = _ped_frames(bev_shift=0.4)
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    py = ke.evaluate(gt_dir, res_dir, write_stats=False, server=True,
                     n_testimages=len(frames))
    out = subprocess.run([CPP_BIN, f"--server={len(frames)}", gt_dir,
                          res_dir], capture_output=True, text=True,
                         check=True)
    path = os.path.join(res_dir, "stats_pedestrian_detection_ground.txt")
    rows = [list(map(float, line.split()))
            for line in open(path).read().splitlines() if line.strip()]
    for diff_idx, diff in enumerate(("easy", "moderate", "hard")):
        np.testing.assert_allclose(
            rows[diff_idx], py["pedestrian"]["ground"][diff]["precision"],
            atol=1e-6)
    # missing-file abort
    os.remove(os.path.join(res_dir, "data", "000003.txt"))
    r = subprocess.run([CPP_BIN, f"--server={len(frames)}", gt_dir, res_dir],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "missing" in r.stderr


# ------------------------------------------------------------------- plots

def test_pr_curve_plot_emission(tmp_path):
    """stats files -> PNG artifacts in <result_dir>/plot (reference parity:
    gnuplot emission, r40.cpp:708-776)."""
    from egonet_tpu.eval import plots
    frames = [(g, d) for g, d in (_spread_gt(5, seed=s) for s in range(6))]
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    ke.evaluate(gt_dir, res_dir, write_stats=True)
    written = plots.plot_pr_curves(res_dir)
    names = {os.path.basename(p) for p in written}
    assert "car_detection.png" in names
    assert "car_orientation.png" in names
    for p in written:
        assert os.path.getsize(p) > 1000


def test_python_evaluator_cli(tmp_path, capsys):
    """python -m egonet_tpu.eval.kitti_eval prints the same summary lines
    as the C++ binary and honors --plot."""
    frames = [(g, d) for g, d in (_spread_gt(7, seed=s) for s in range(6))]
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    rc = ke.main([gt_dir, res_dir, "--plot"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "car_detection AP: 100.000000 100.000000 100.000000" in out
    assert "car_orientation AP:" in out   # official label (r40.cpp:723)
    assert "car_detection.png" in out


@pytest.mark.skipif(not os.path.exists(CPP_BIN),
                    reason="C++ evaluator not built")
def test_cpp_matches_python_multiclass_dontcare(tmp_path):
    """Harder randomized differential: all three evaluated classes plus
    neighbor-class GTs (Van, Person_sitting), DontCare regions, rotated
    BEV boxes, mixed occlusion/truncation/heights — the C++ binary and
    the Python twin must produce identical precision/AOS curves."""
    rng = np.random.RandomState(11)
    class_proto = {
        "Car": dict(h=1.5, w=1.6, l=3.9),
        "Van": dict(h=2.1, w=1.9, l=5.0),
        "Pedestrian": dict(h=1.8, w=0.6, l=0.9),
        "Person_sitting": dict(h=1.3, w=0.6, l=0.9),
        "Cyclist": dict(h=1.7, w=0.6, l=1.8),
    }
    frames = []
    for f in range(10):
        gts, dets = [], []
        for slot in range(9):
            cls = list(class_proto)[rng.randint(0, len(class_proto))]
            x = 10.0 + 130.0 * slot
            height = float(rng.uniform(22, 90))
            g = obj(type=cls, x1=x, y1=110.0, x2=x + 90.0,
                    y2=110.0 + height,
                    occlusion=int(rng.randint(0, 3)),
                    truncation=float(rng.uniform(0, 0.55)),
                    t1=-50.0 + 12.0 * slot, t3=float(rng.uniform(8, 55)),
                    ry=float(rng.uniform(-np.pi, np.pi)),
                    alpha=float(rng.uniform(-np.pi, np.pi)),
                    **class_proto[cls])
            gts.append(g)
            if rng.rand() < 0.85:          # detection (sometimes missed)
                det_cls = cls if rng.rand() < 0.8 else "Car"
                d = obj(**{**g.__dict__})
                d.type = det_cls
                d.x1 += rng.uniform(-12, 12)
                d.x2 += rng.uniform(-12, 12)
                d.y1 += rng.uniform(-6, 6)
                d.y2 += rng.uniform(-6, 6)
                d.t1 += rng.uniform(-0.5, 0.5)
                d.t3 += rng.uniform(-0.5, 0.5)
                d.ry += rng.uniform(-0.4, 0.4)
                d.alpha += rng.uniform(-0.5, 0.5)
                d.score = float(rng.uniform(0.2, 1.0))
                dets.append(d)
        # DontCare region + a spurious detection inside it
        dc = ke.Obj(type="DontCare", truncation=-1, occlusion=-1, alpha=-10,
                    x1=1250.0, y1=95.0, x2=1350.0, y2=165.0)
        gts.append(dc)
        if rng.rand() < 0.7:
            sp = obj(x1=1255.0, y1=100.0, x2=1345.0, y2=160.0,
                     t1=70.0, t3=30.0)
            sp.score = float(rng.uniform(0.5, 1.0))
            dets.append(sp)
        frames.append((gts, dets))
    gt_dir, res_dir = make_dirs(tmp_path, frames)

    py = ke.evaluate(gt_dir, res_dir, write_stats=False)
    subprocess.run([CPP_BIN, gt_dir, res_dir], capture_output=True,
                   text=True, check=True)
    compared = 0
    for cls in ("car", "pedestrian", "cyclist"):
        if cls not in py:
            continue
        for metric, suffix in (("image", "detection"),
                               ("ground", "detection_ground"),
                               ("3d", "detection_3d")):
            path = os.path.join(res_dir, f"stats_{cls}_{suffix}.txt")
            if metric not in py[cls]:
                assert not os.path.exists(path), (cls, metric)
                continue
            rows = [list(map(float, line.split()))
                    for line in open(path).read().splitlines()
                    if line.strip()]
            for di, diff in enumerate(("easy", "moderate", "hard")):
                np.testing.assert_allclose(
                    rows[di], py[cls][metric][diff]["precision"],
                    atol=1e-6, err_msg=f"{cls}/{metric}/{diff}")
                compared += 1
        path = os.path.join(res_dir, f"stats_{cls}_orientation.txt")
        # both sides must AGREE on whether AOS exists for this class
        py_has_aos = bool(py[cls]["image"]["easy"]["aos"])
        assert os.path.exists(path) == py_has_aos, (cls, py_has_aos)
        if py_has_aos:
            rows = [list(map(float, line.split()))
                    for line in open(path).read().splitlines()
                    if line.strip()]
            for di, diff in enumerate(("easy", "moderate", "hard")):
                np.testing.assert_allclose(
                    rows[di], py[cls]["image"][diff]["aos"], atol=1e-6,
                    err_msg=f"{cls}/aos/{diff}")
                compared += 1
    assert compared >= 12, "differential barely exercised"


def test_degenerate_bev_box_has_no_interior():
    """A zero-dimension BEV box (l=w=0, e.g. a DontCare row with no 3D
    extent) collapses to a point: its intersection with anything is empty.
    A naive Sutherland-Hodgman clip treats every half-plane test as
    trivially true and returns the WHOLE subject area (previously
    absorbing detections into the stuff area); Boost — the reference's
    geometry backend — returns 0."""
    a = obj(l=4.0, w=2.0, t1=0.0, t3=0.0, ry=0.0)
    z = obj(l=0.0, w=0.0, t1=0.0, t3=0.0, ry=0.3)
    assert ke.bev_intersection_area(a, z) == 0.0
    assert ke.ground_box_overlap(a, z, 0) == 0.0
    assert ke.box3d_overlap(a, z, 0) == 0.0


def test_stray_txt_in_data_dir_ignored(tmp_path):
    """A non-frame txt (notes.txt) in result_dir/data must not abort the
    evaluation hunting for its ground truth."""
    frames = [_spread_gt(7, seed=f) for f in range(6)]
    gt_dir, res_dir = make_dirs(tmp_path, frames)
    with open(os.path.join(res_dir, "data", "notes.txt"), "w") as f:
        f.write("scratch file, not a detection frame\n")
    results = ke.evaluate(gt_dir, res_dir, write_stats=False)
    assert results["car"]["image"]["easy"]["ap_r40"] == pytest.approx(100.0)
    if os.path.exists(CPP_BIN):
        out = subprocess.run([CPP_BIN, gt_dir, res_dir],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr
        assert "number of files for evaluation: 6" in out.stdout


@pytest.mark.skipif(not os.path.exists(CPP_BIN),
                    reason="C++ evaluator not built")
def test_cpp_server_count_overflow_rejected(tmp_path):
    """--server=N beyond int range must error out, not truncate to a tiny
    (or zero) count and silently evaluate nothing."""
    for bad in ("4294967296", "999999999999999999999", "10000001"):
        out = subprocess.run([CPP_BIN, f"--server={bad}", str(tmp_path),
                              str(tmp_path)], capture_output=True, text=True)
        assert out.returncode != 0, bad
        assert "invalid" in out.stderr


@pytest.mark.skipif(not os.path.exists(CPP_BIN),
                    reason="C++ evaluator not built")
def test_cpp_email_notification_offline_fallback(tmp_path):
    """--email teed notification (reference Mail, kitti-eval/mail.h:8-46):
    with no sendmail on the host the composed message lands in
    <result_dir>/notification.txt — headers plus exactly the lines printed
    to stdout, in order."""
    frames = [(_spread_gt(5, seed=f)) for f in range(3)]
    gt_dir, res_dir = make_dirs(tmp_path, [(g, d) for g, d in frames])
    out = subprocess.run([CPP_BIN, "--email=user@example.com",
                          gt_dir, res_dir], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    note = os.path.join(res_dir, "notification.txt")
    if os.path.exists("/usr/lib/sendmail"):
        pytest.skip("host has sendmail; fallback file not expected")
    assert os.path.exists(note)
    body = open(note).read()
    assert body.startswith("To: user@example.com\n"
                           "Subject: KITTI Evaluation Benchmark\n")
    teed = [ln for ln in out.stdout.splitlines()
            if ln and not ln.startswith("notification written")]
    assert body.splitlines()[-len(teed):] == teed
    assert any(ln.startswith("car_orientation AP:") for ln in teed)
    # no email -> no notification artifact
    res2 = os.path.join(str(tmp_path), "res2")
    os.makedirs(os.path.join(res2, "data"))
    for n in os.listdir(os.path.join(res_dir, "data")):
        with open(os.path.join(res_dir, "data", n)) as f:
            open(os.path.join(res2, "data", n), "w").write(f.read())
    out2 = subprocess.run([CPP_BIN, gt_dir, res2],
                          capture_output=True, text=True)
    assert out2.returncode == 0, out2.stderr
    assert not os.path.exists(os.path.join(res2, "notification.txt"))
