"""DAVIS J&F evaluator tests: J/F math on hand-checkable masks, a
differential oracle for the official f_boundary formula (per-pixel
transcription of seg2bmap + brute-force disk dilation), toolkit statistics,
and the benchmark over a synthetic DAVIS layout + saved masks."""
import numpy as np
import pytest
from PIL import Image

from siammask_tpu.eval.davis import (DAVISBenchmark, db_eval_boundary,
                                     db_eval_iou, seg2bmap, statistics)


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


def _seg2bmap_oracle(seg):
    """Per-pixel transcription of the official f_boundary.py seg2bmap
    (same-size path): independent of the vectorized production code."""
    seg = (seg > 0).astype(np.uint8)
    h, w = seg.shape
    b = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            e = seg[y, x + 1] if x + 1 < w else 0
            s = seg[y + 1, x] if y + 1 < h else 0
            se = seg[y + 1, x + 1] if (y + 1 < h and x + 1 < w) else 0
            if y == h - 1 and x == w - 1:
                b[y, x] = False
            elif y == h - 1:
                b[y, x] = bool(seg[y, x] ^ e)
            elif x == w - 1:
                b[y, x] = bool(seg[y, x] ^ s)
            else:
                b[y, x] = bool((seg[y, x] ^ e) | (seg[y, x] ^ s)
                               | (seg[y, x] ^ se))
    return b


def _f_oracle(fg_mask, gt_mask, bound_th=0.008):
    """Official F computed with the per-pixel boundary oracle and a
    brute-force L2-disk dilation (shift-accumulate over disk offsets)."""
    h, w = gt_mask.shape
    r = int(np.ceil(bound_th * np.linalg.norm([h, w])))
    fg_b, gt_b = _seg2bmap_oracle(fg_mask), _seg2bmap_oracle(gt_mask)
    if not fg_b.any() and not gt_b.any():
        return 1.0
    if not fg_b.any() or not gt_b.any():
        return 0.0

    def dilate(b):
        out = np.zeros_like(b)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy * dy + dx * dx > r * r:
                    continue
                src = b[max(0, -dy):h - max(0, dy),
                        max(0, -dx):w - max(0, dx)]
                out[max(0, dy):h - max(0, -dy),
                    max(0, dx):w - max(0, -dx)] |= src
        return out

    precision = np.count_nonzero(fg_b & dilate(gt_b)) / np.count_nonzero(fg_b)
    recall = np.count_nonzero(gt_b & dilate(fg_b)) / np.count_nonzero(gt_b)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_f_boundary_matches_official_oracle(seed):
    """db_eval_boundary must equal the official f_boundary formula exactly on
    real-shaped blobby masks (the round-2 morphological-gradient stand-in
    deviated; this pins the seg2bmap + L2-disk implementation)."""
    import cv2

    rng = np.random.RandomState(seed)
    h, w = 120, 214  # non-square, distinct diag -> nontrivial bound_pix
    blob = lambda: cv2.GaussianBlur(
        rng.rand(h, w).astype(np.float32), (31, 31), 8) > 0.5
    fg, gt = blob(), blob()
    assert fg.any() and gt.any()
    # boundary maps themselves must match the per-pixel transcription
    np.testing.assert_array_equal(seg2bmap(fg), _seg2bmap_oracle(fg))
    np.testing.assert_array_equal(seg2bmap(gt), _seg2bmap_oracle(gt))
    np.testing.assert_allclose(db_eval_boundary(fg, gt), _f_oracle(fg, gt),
                               rtol=0, atol=0)


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
