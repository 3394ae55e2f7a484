"""Differential: our from-scratch C++ evaluator vs the REFERENCE's own
compiled binaries (the last unverified oracle, VERDICT r3 missing #3).

Boost is not installed in this environment; the reference evaluators
compile against the minimal vendored shim in tools/kitti-eval/boost-shim
(convex-polygon clip + uBLAS 2xN matrices — exactly the surface
evaluate_object_3d_offline*.cpp:12-18,269-344 touches).  Both the R40 and
R11 reference binaries then run on randomized scenes next to our
tools/kitti-eval/kitti_eval.cpp, and every stats file must agree
numerically: same thresholds, same clean_data ignore semantics, same
greedy matching, same AOS accumulation, same precision envelope.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from tests.test_kitti_eval import _det_line, _gt_line, obj

HERE = os.path.dirname(__file__)
REPO = os.path.join(HERE, "..")
REF_DIR = "/root/reference/tools/kitti-eval"
SHIM = os.path.join(REPO, "tools", "kitti-eval", "boost-shim")
OUR_BIN = os.path.join(REPO, "tools", "kitti-eval",
                       "evaluate_object_3d_offline")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference sources not available")


@pytest.fixture(scope="module")
def binaries(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refbin")
    out = {}
    for name, src in (("r40", "evaluate_object_3d_offline_r40.cpp"),
                      ("r11", "evaluate_object_3d_offline.cpp")):
        binary = str(tmp / f"ref_{name}")
        proc = subprocess.run(
            ["g++", "-O2", "-std=c++14", "-I", SHIM, "-I", REF_DIR,
             "-o", binary, os.path.join(REF_DIR, src)],
            capture_output=True, text=True)
        if proc.returncode != 0:
            pytest.skip(f"reference {name} does not compile here: "
                        f"{proc.stderr[:400]}")
        out[name] = binary
    if not os.path.exists(OUR_BIN):
        subprocess.check_call(["make", "-C", os.path.dirname(OUR_BIN)])
    out["ours"] = OUR_BIN
    return out


# ------------------------------------------------------------- scene gen

CLASSES = ["Car", "Van", "Pedestrian", "Person_sitting", "Cyclist",
           "Truck", "DontCare"]


def random_object(rng):
    """One KITTI object with randomized class, difficulty attributes, and
    a BEV pose; 2D boxes span the difficulty height gates (>=25 px)."""
    cls = CLASSES[rng.randint(len(CLASSES))]
    h2d = rng.uniform(20.0, 180.0)               # straddles 25/40 px gates
    w2d = h2d * rng.uniform(0.4, 2.6)
    x1 = rng.uniform(0.0, 1100.0)
    y1 = rng.uniform(50.0, 250.0)
    o = obj(type=cls,
            truncation=float(rng.choice([0.0, 0.1, 0.2, 0.4, 0.6])),
            occlusion=int(rng.choice([0, 1, 2, 3])),
            alpha=float(rng.uniform(-np.pi, np.pi)),
            x1=x1, y1=y1, x2=x1 + w2d, y2=y1 + h2d,
            h=float(rng.uniform(1.2, 3.2)), w=float(rng.uniform(0.5, 2.4)),
            l=float(rng.uniform(0.8, 10.0)),
            t1=float(rng.uniform(-30.0, 30.0)),
            t2=float(rng.uniform(1.0, 2.2)),
            t3=float(rng.uniform(4.0, 70.0)),
            ry=float(rng.uniform(-np.pi, np.pi)))
    if cls == "DontCare":                        # KITTI convention: -1/-10
        o.truncation, o.occlusion, o.alpha = -1.0, -1, -10.0
        o.h = o.w = o.l = -1.0
        o.t1 = o.t2 = o.t3 = -1000.0
        o.ry = -10.0
    return o


def perturbed_detection(rng, g, jitter):
    """A detection derived from GT with box/pose/angle noise and a score."""
    d = obj(**{**g.__dict__})
    if d.type == "DontCare":
        d.type = "Car"
    w, hh = g.x2 - g.x1, g.y2 - g.y1
    d.x1 += rng.uniform(-jitter, jitter) * w
    d.x2 += rng.uniform(-jitter, jitter) * w
    d.y1 += rng.uniform(-jitter, jitter) * hh
    d.y2 += rng.uniform(-jitter, jitter) * hh
    if d.x2 <= d.x1 + 1:
        d.x2 = d.x1 + 1.0
    if d.y2 <= d.y1 + 1:
        d.y2 = d.y1 + 1.0
    d.t1 += rng.uniform(-0.5, 0.5)
    d.t3 += rng.uniform(-0.5, 0.5)
    d.ry += rng.uniform(-0.3, 0.3)
    d.alpha += rng.uniform(-0.4, 0.4)
    d.score = float(rng.uniform(0.05, 1.0))
    return d


def random_frames(rng, n_frames, jitter=0.08):
    frames = []
    for _ in range(n_frames):
        gts = [random_object(rng) for _ in range(rng.randint(0, 9))]
        dets = []
        for g in gts:
            if rng.rand() < 0.8:                 # detected (maybe badly)
                dets.append(perturbed_detection(rng, g, jitter))
        for _ in range(rng.randint(0, 3)):       # false positives
            fp = random_object(rng)
            if fp.type == "DontCare":
                fp.type = "Cyclist"
            fp = perturbed_detection(rng, fp, jitter)
            dets.append(fp)
        frames.append((gts, dets))
    return frames


def write_world(tmp_path, frames, result_names):
    """gt dir + one result dir PER binary (each binary writes its stats
    into its own result_dir), all sharing identical data/ txts."""
    gt_dir = tmp_path / "label_2"
    gt_dir.mkdir(parents=True, exist_ok=True)
    res_dirs = {}
    for name in result_names:
        (tmp_path / name / "data").mkdir(parents=True, exist_ok=True)
        res_dirs[name] = str(tmp_path / name)
    for i, (gts, dets) in enumerate(frames):
        (gt_dir / f"{i:06d}.txt").write_text(
            "\n".join(_gt_line(g) for g in gts) + "\n")
        body = "\n".join(_det_line(d) for d in dets) + "\n"
        for name in result_names:
            (tmp_path / name / "data" / f"{i:06d}.txt").write_text(body)
    return str(gt_dir), res_dirs


def read_stats(result_dir):
    """{stats file name: [floats]} for every stats_*.txt present."""
    out = {}
    for fn in sorted(os.listdir(result_dir)):
        if fn.startswith("stats_") and fn.endswith(".txt"):
            vals = []
            with open(os.path.join(result_dir, fn)) as f:
                for line in f:
                    vals.extend(float(v) for v in line.split())
            out[fn] = np.asarray(vals)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stats_files_match_reference(binaries, tmp_path, seed):
    """Randomized mixed-class scenes: every stats_*.txt our binary writes
    must match the reference R40 binary's numerically (the reference R11
    binary differs only in the printed AP average, sharing its stats
    format with R40 — our single binary prints both)."""
    rng = np.random.RandomState(100 + seed)
    frames = random_frames(rng, n_frames=12)
    gt_dir, res = write_world(tmp_path, frames, ["ref", "ours"])

    ref_out = subprocess.run([binaries["r40"], gt_dir, res["ref"]],
                             capture_output=True, text=True)
    assert ref_out.returncode == 0, ref_out.stdout + ref_out.stderr
    our_out = subprocess.run([binaries["ours"], gt_dir, res["ours"]],
                             capture_output=True, text=True)
    assert our_out.returncode == 0, our_out.stdout + our_out.stderr

    ref_stats = read_stats(res["ref"])
    our_stats = read_stats(res["ours"])
    assert ref_stats, "reference produced no stats files"
    assert set(ref_stats) == set(our_stats), (
        set(ref_stats) ^ set(our_stats))
    for fn in ref_stats:
        assert ref_stats[fn].shape == our_stats[fn].shape, fn
        np.testing.assert_allclose(our_stats[fn], ref_stats[fn],
                                   atol=1e-5, err_msg=fn)


def test_printed_ap_matches_both_metrics(binaries, tmp_path):
    """The printed AP lines: reference R40 prints the 40-point mean,
    reference R11 the 11-point mean; our binary prints both — each must
    agree with its reference counterpart."""
    rng = np.random.RandomState(7)
    frames = random_frames(rng, n_frames=10)
    gt_dir, res = write_world(tmp_path, frames, ["r40", "r11", "ours"])

    def ap_lines(text):
        got = {}
        for ln in text.splitlines():
            parts = ln.split()
            # reference: "car_detection AP: a b c"; ours adds AP_R11 rows
            if len(parts) == 5 and parts[1].rstrip(":") in ("AP", "AP_R11"):
                got[(parts[0], parts[1].rstrip(":"))] = [
                    float(v) for v in parts[2:]]
        return got

    ref40 = ap_lines(subprocess.run(
        [binaries["r40"], gt_dir, res["r40"]], capture_output=True,
        text=True).stdout)
    ref11 = ap_lines(subprocess.run(
        [binaries["r11"], gt_dir, res["r11"]], capture_output=True,
        text=True).stdout)
    ours = ap_lines(subprocess.run(
        [binaries["ours"], gt_dir, res["ours"]], capture_output=True,
        text=True).stdout)
    assert ref40 and ref11

    for (label, _), vals in ref40.items():
        np.testing.assert_allclose(ours[(label, "AP")], vals, atol=2e-4,
                                   err_msg=f"{label} R40")
    for (label, _), vals in ref11.items():
        np.testing.assert_allclose(ours[(label, "AP_R11")], vals,
                                   atol=2e-4, err_msg=f"{label} R11")
