"""Eval-toolkit tests: statistics + AR/EAO benchmark protocol on synthetic data,
cross-checked against the reference implementations where importable (the
reference statistics module needs numba, absent here — so protocol values are
checked against hand-computed expectations instead)."""
import numpy as np
import pytest

from siammask_tpu.eval.benchmarks import AccuracyRobustnessBenchmark, EAOBenchmark
from siammask_tpu.eval.statistics import (calculate_accuracy,
                                          calculate_expected_overlap,
                                          calculate_failures, determine_thresholds,
                                          overlap_ratio, success_overlap)


def test_calculate_failures():
    traj = [[1], [10, 10, 5, 5], [2], [0], [0], [10, 10, 5, 5], [2]]
    n, idx = calculate_failures(traj)
    assert n == 2 and idx == [2, 6]


def test_calculate_accuracy_burnin():
    gt = [[0, 0, 10, 10]] * 6
    pred = [[1], [0, 0, 10, 10], [0, 0, 10, 10], [2], [1], [0, 0, 10, 10]]
    acc, overlaps = calculate_accuracy(pred, gt, burnin=2, bound=(100, 100))
    # frames 0,1 burned after init marker, 4,5 burned after re-init marker
    assert np.isnan(overlaps[0]) and np.isnan(overlaps[1])
    assert overlaps[2] == pytest.approx(1.0)
    assert np.isnan(overlaps[4]) and np.isnan(overlaps[5])
    assert acc == pytest.approx(np.nanmean(overlaps))


def test_overlap_ratio():
    a = np.array([[0, 0, 10, 10], [0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 0, 10, 10]])
    iou = overlap_ratio(a, b)
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(50 / 150)


def test_success_overlap():
    gt = np.array([[5, 5, 10, 10]] * 4, dtype=np.float64)
    res = np.array([[5, 5, 10, 10]] * 2 + [[100, 100, 5, 5]] * 2, dtype=np.float64)
    s = success_overlap(gt, res, 4)
    assert s[0] == pytest.approx(0.5)   # thr 0: half the frames overlap
    assert s[-1] == pytest.approx(0.0)


def test_expected_overlap_simple():
    # two fragments: one perfect len-4, one failed-at-2
    fragments = np.array([
        [1.0, 1.0, 1.0, 1.0],
        [1.0, 0.5, np.nan, np.nan],
    ])
    fweights = np.array([1.0, 1.0])
    eo = calculate_expected_overlap(fragments, fweights)
    assert eo[0] == 1
    assert eo[1] == pytest.approx((1.0 + 0.5) / 2)
    # at len 3 only fragment 0 is alive
    assert eo[2] == pytest.approx(1.0)


def test_determine_thresholds():
    scores = np.linspace(0, 1, 200)
    th = determine_thresholds(scores, resolution=100)
    assert th[0] == -np.inf and th[-1] == np.inf
    assert np.all(np.diff(th[1:-1]) >= 0)


class _FakeVideo:
    def __init__(self, name, gt, traj, width=100, height=100):
        self.name = name
        self.gt_traj = gt
        self.pred_trajs = {"t": [traj]}
        self.width = width
        self.height = height
        self.tags = {"all": [1] * len(gt)}

    def select_tag(self, tag, start=0, end=0):
        return self.tags[tag][start:end]


class _FakeDataset:
    name = "VOT2018"
    tracker_path = None
    tracker_names = ["t"]

    def __init__(self, videos):
        self.videos = {v.name: v for v in videos}

    def __iter__(self):
        return iter(self.videos.values())

    def __getitem__(self, k):
        if isinstance(k, str):
            return self.videos[k]
        return list(self.videos.values())[k]

    def __len__(self):
        return len(self.videos)


def _make_dataset(n_frames=420):
    gt = [[10, 10, 30, 10, 30, 30, 10, 30]] * n_frames
    # perfect tracking, one failure at frame 50
    traj = [[1]] + [[10, 10, 20, 20]] * 49 + [[2]] + [[0]] * 4 + [[1]] \
        + [list([10, 10, 20, 20])] * (n_frames - 56)
    return _FakeDataset([_FakeVideo("v1", gt, traj)])


def test_ar_benchmark_protocol():
    ds = _make_dataset()
    ar = AccuracyRobustnessBenchmark(ds)
    res = ar.eval("t")
    summary = AccuracyRobustnessBenchmark.summarize(res)
    s = summary["t"]
    assert s["lost_number"] == 1.0
    assert 0.9 < s["accuracy"] <= 1.0  # tracked frames overlap gt perfectly
    assert s["robustness"] == pytest.approx(1 / 420 * 100, rel=1e-6)


def test_eao_benchmark_runs():
    ds = _make_dataset()
    eao = EAOBenchmark(ds)
    res = eao.eval("t")
    assert 0 < res["t"]["all"] <= 1.0
