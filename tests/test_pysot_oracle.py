"""Differential test of the VOT eval toolkit against the reference pysot
implementation itself.

The reference's AR/EAO math (`utils/pysot/evaluation/{ar,eao}_benchmark.py`,
`utils/pysot/utils/statistics.py`) is plain numpy under `@numba.jit`
decorators — importable with a two-line numba stub; the compiled Cython
`region` module is substituted with our C++ region binding (itself
differential-fuzzed against the reference C sources in test_region.py). Both
stacks then score the SAME synthetic result trees loaded through their own
VOTDataset loaders, so any transcription error in the protocol constants
(burnin masking, fragment NaN padding, per-fragment weights, the
100..356 / 46..291 EAO intervals) shows up as a numeric delta here.
"""
import json
import sys
import types
from os.path import join

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def pysot():
    """Import the reference pysot eval toolkit with numba + region stubbed."""
    # numba stub: @jit and @jit(nopython=True) both become identity
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba.jit = jit
    sys.modules.setdefault("numba", numba)

    # the Cython region module -> our C++ binding (same C semantics, fuzz-
    # verified); must be registered before utils.pysot.utils imports it
    from siammask_tpu.eval import region as our_region
    sys.modules.setdefault("utils.pysot.utils.region", our_region)

    sys.path.insert(0, REF)
    try:
        import utils.pysot.utils  # noqa: F401  (binds the region stub)
        from utils.pysot.datasets.vot import VOTDataset as RefVOTDataset
        from utils.pysot.evaluation import (AccuracyRobustnessBenchmark as
                                            RefAR)
        from utils.pysot.evaluation import EAOBenchmark as RefEAO
        yield RefVOTDataset, RefAR, RefEAO
    finally:
        sys.path.remove(REF)


def _rot_rect(cx, cy, w, h, theta):
    c, s = np.cos(theta), np.sin(theta)
    pts = []
    for dx, dy in ((-w / 2, -h / 2), (-w / 2, h / 2), (w / 2, h / 2),
                   (w / 2, -h / 2)):
        pts += [cx + c * dx - s * dy, cy + s * dx + c * dy]
    return pts


def make_vot(root, name="VOT2018", tracker="trk",
             lengths=(420, 260, 130), fail_frames=((50, 200), (80,), ())):
    """Write a synthetic VOT benchmark: <root>/<name>.json metadata plus a
    result tree <root>/test/<name>/<tracker>/baseline/<video>/<video>_001.txt
    following the reference writer's 1/2/0/polygon line protocol
    (reference tools/test.py:398-413)."""
    rng = np.random.RandomState(hash(name) % (2 ** 31))
    meta = {}
    for v, (length, fails) in enumerate(zip(lengths, fail_frames)):
        video = f"v{v}"
        w0, h0 = 40 + 10 * v, 30 + 5 * v
        width, height = 640, 480
        gt, traj = [], []
        next_init = 0
        fail_set = set(fails)
        for f in range(length):
            cx = 100 + 0.5 * f + 20 * np.sin(f / 30)
            cy = 120 + 0.3 * f
            theta = 0.1 * np.sin(f / 17)
            gt.append(_rot_rect(cx, cy, w0, h0, theta))
            if f == next_init:
                traj.append([1.0])
            elif f in fail_set:
                traj.append([2.0])
                next_init = f + 5
            elif f < next_init:
                traj.append([0.0])
            else:
                # jittered prediction: overlap varies smoothly in (0, 1)
                jx, jy = rng.uniform(-12, 12, 2)
                sc = rng.uniform(0.85, 1.15)
                traj.append(_rot_rect(cx + jx, cy + jy, w0 * sc, h0 * sc,
                                      theta + rng.uniform(-0.1, 0.1)))
        tags = {t: rng.randint(0, 2, length).tolist()
                for t in ("camera_motion", "illum_change", "motion_change",
                          "size_change", "occlusion")}
        meta[video] = {
            "video_dir": video,
            "init_rect": [0, 0, w0, h0],
            "img_names": [f"{video}/{i + 1:08d}.jpg" for i in range(length)],
            "gt_rect": gt,
            "width": width,
            "height": height,
            **tags,
        }
        rdir = root / "test" / name / tracker / "baseline" / video
        rdir.mkdir(parents=True)
        lines = [",".join(f"{x:.4f}" for x in r) if len(r) > 1
                 else str(int(r[0])) for r in traj]
        (rdir / f"{video}_001.txt").write_text("\n".join(lines) + "\n")
    (root / f"{name}.json").write_text(json.dumps(meta))
    return root


@pytest.mark.parametrize("name", ["VOT2018", "VOT2019"])
def test_ar_eao_match_reference_pysot(pysot, tmp_path, name):
    RefVOTDataset, RefAR, RefEAO = pysot
    from siammask_tpu.eval.benchmarks import (AccuracyRobustnessBenchmark,
                                              EAOBenchmark)
    from siammask_tpu.eval.datasets import VOTDataset

    make_vot(tmp_path, name=name)
    tracker_root = join(str(tmp_path), "test", name)

    ours = VOTDataset(name, str(tmp_path))
    ours.set_tracker(tracker_root, ["trk"])
    ref = RefVOTDataset(name, str(tmp_path))
    ref.set_tracker(tracker_root, ["trk"])

    ar_ours = AccuracyRobustnessBenchmark(ours).eval("trk")
    ar_ref = RefAR(ref).eval("trk")
    assert ar_ours["trk"]["failures"] == ar_ref["trk"]["failures"]
    for video in ar_ref["trk"]["overlaps"]:
        np.testing.assert_allclose(
            np.asarray(ar_ours["trk"]["overlaps"][video], dtype=np.float64),
            np.asarray(ar_ref["trk"]["overlaps"][video], dtype=np.float64),
            rtol=0, atol=0, equal_nan=True,
            err_msg=f"per-frame AR overlaps diverge on {video}")

    eao_ours = EAOBenchmark(ours).eval("trk")
    eao_ref = RefEAO(ref).eval("trk")
    assert eao_ours["trk"]["all"] == pytest.approx(eao_ref["trk"]["all"],
                                                   abs=1e-12)
    assert 0 < eao_ours["trk"]["all"] < 1


def test_statistics_match_reference_pysot(pysot):
    """Direct differential check of the statistics kernels on random inputs
    (success/precision curves + expected-overlap) — the numba-decorated plain
    numpy in the reference vs our vectorized versions."""
    del pysot  # fixture already installed the stubs
    from utils.pysot.utils import statistics as ref_stats

    from siammask_tpu.eval import statistics as our_stats

    rng = np.random.RandomState(7)
    # success_overlap / success_error
    gt = np.abs(rng.randn(50, 4)) * 50 + 1
    res = gt + rng.randn(50, 4) * 10
    np.testing.assert_allclose(
        our_stats.success_overlap(gt, res, 50),
        ref_stats.success_overlap(gt, res, 50), rtol=0, atol=0)
    thr = np.arange(0, 51, 5).astype(np.float64)
    np.testing.assert_allclose(
        our_stats.success_error(gt[:, :2], res[:, :2], thr, 50),
        ref_stats.success_error(gt[:, :2], res[:, :2], thr, 50),
        rtol=0, atol=0)

    # expected-overlap curve over NaN-padded fragments
    frags = rng.rand(6, 40)
    for i, end in enumerate((40, 35, 17, 3, 40, 25)):
        frags[i, end:] = np.nan
    weights = rng.rand(6)
    np.testing.assert_allclose(
        our_stats.calculate_expected_overlap(frags, weights),
        ref_stats.calculate_expected_overlap(frags, weights),
        rtol=1e-6, atol=1e-9)
