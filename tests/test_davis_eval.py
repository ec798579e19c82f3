"""DAVIS J&F evaluator tests: J/F math on hand-checkable masks, toolkit
statistics, and the benchmark over a synthetic DAVIS layout + saved masks."""
import numpy as np
from PIL import Image

from siammask_tpu.eval.davis import (DAVISBenchmark, db_eval_boundary,
                                     db_eval_iou, statistics)


def _square(h, w, y, x, s):
    m = np.zeros((h, w), np.uint8)
    m[y:y + s, x:x + s] = 1
    return m


def test_j_iou_cases():
    a = _square(100, 100, 20, 20, 30)
    assert db_eval_iou(a, a) == 1.0
    assert db_eval_iou(np.zeros((50, 50)), np.zeros((50, 50))) == 1.0
    assert db_eval_iou(np.zeros((100, 100)), a) == 0.0
    b = _square(100, 100, 20, 21, 30)  # shift 1px: inter 30*29, union 30*31
    np.testing.assert_allclose(db_eval_iou(a, b), (30 * 29) / (30 * 31))


def test_f_boundary_cases():
    a = _square(200, 200, 50, 50, 60)
    assert db_eval_boundary(a, a) == 1.0
    assert db_eval_boundary(np.zeros((200, 200)), np.zeros((200, 200))) == 1.0
    assert db_eval_boundary(np.zeros((200, 200)), a) == 0.0
    # 1px shift stays within the 0.008*diag (~3px) tolerance -> perfect F
    b = _square(200, 200, 50, 51, 60)
    assert db_eval_boundary(a, b) == 1.0
    # far-apart squares share no tolerant boundary at all
    c = _square(200, 200, 120, 120, 60)
    assert db_eval_boundary(a, c) == 0.0


def test_statistics_recall_decay():
    s = statistics(np.array([0.9, 0.8, 0.4, 0.2]))
    np.testing.assert_allclose(s["mean"], 0.575)
    np.testing.assert_allclose(s["recall"], 0.5)
    np.testing.assert_allclose(s["decay"], 0.7)  # first quarter 0.9, last 0.2


def test_davis_benchmark_end_to_end(tmp_path):
    from tests.test_vos_e2e import _make_davis

    data_dir = tmp_path / "data"
    _make_davis(data_dir / "DAVIS", n_frames=6)
    from siammask_tpu.eval.datasets import load_dataset
    dataset = load_dataset("DAVIS2017", str(data_dir))

    # a perfect tracker: result masks == annotations (multi-object ids)
    res_root = tmp_path / "test"
    perfect = res_root / "DAVIS2017" / "perfect" / "synth"
    shifted = res_root / "DAVIS2017" / "shifted" / "synth"
    perfect.mkdir(parents=True)
    shifted.mkdir(parents=True)
    for i, anno_file in enumerate(dataset["synth"]["anno_files"]):
        a = np.array(Image.open(anno_file))
        Image.fromarray(a).save(perfect / f"{i:05d}.png")
        Image.fromarray(np.roll(a, 8, axis=1)).save(shifted / f"{i:05d}.png")

    bench = DAVISBenchmark(dataset, "DAVIS2017", str(res_root))
    results = {}
    for t in ("perfect", "shifted"):
        results.update(bench.eval(t))
    summary = DAVISBenchmark.summarize(results)

    assert summary["perfect"]["J_mean"] == 1.0
    assert summary["perfect"]["F_mean"] == 1.0
    assert summary["perfect"]["J_recall"] == 1.0
    # an 8px horizontal roll hurts J and F but keeps overlap for 25-30px boxes
    assert 0.2 < summary["shifted"]["J_mean"] < 0.9
    assert summary["shifted"]["J_mean"] < summary["perfect"]["J_mean"]
    assert summary["shifted"]["F_mean"] < 1.0
