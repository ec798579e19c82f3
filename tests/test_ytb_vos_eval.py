"""YouTube-VOS J_s/J_u/F_s/F_u scorer tests over a synthetic valid-split
layout: per-object frame ranges, seen/unseen category split resolution from a
train meta.json, and the summary format."""
import json

import numpy as np
from PIL import Image

from siammask_tpu.eval.datasets import load_dataset
from siammask_tpu.eval.ytb_vos import YTBVOSBenchmark, seen_categories_for

H, W = 90, 120


def _square(y, x, s, v, canvas=None):
    m = np.zeros((H, W), np.uint8) if canvas is None else canvas
    m[y:y + s, x:x + s] = v
    return m


def _make_ytb_vos(data_dir, n_frames=5):
    """Valid-split layout: video 'vidA' with object 1 ('person', seen —
    present from frame 0) and object 2 ('lizard', unseen — appears at frame
    2), annotations every frame, plus a train split establishing the seen
    set."""
    valid = data_dir / "ytb_vos" / "valid"
    (valid / "JPEGImages" / "vidA").mkdir(parents=True)
    (valid / "Annotations" / "vidA").mkdir(parents=True)
    frames = [f"{5 * i:05d}" for i in range(n_frames)]
    for i, f in enumerate(frames):
        im = np.zeros((H, W, 3), np.uint8)
        Image.fromarray(im).save(valid / "JPEGImages" / "vidA" / f"{f}.jpg")
        anno = _square(10, 10 + 2 * i, 20, 1)
        if i >= 2:
            anno = _square(50, 60, 18, 2, anno)
        Image.fromarray(anno).save(valid / "Annotations" / "vidA" / f"{f}.png")
    meta = {"videos": {"vidA": {"objects": {
        "1": {"category": "person", "frames": frames},
        "2": {"category": "lizard", "frames": frames[2:]},
    }}}}
    (valid / "meta.json").write_text(json.dumps(meta))

    train = data_dir / "ytb_vos" / "train"
    train.mkdir(parents=True)
    train_meta = {"videos": {"t0": {"objects": {
        "1": {"category": "person", "frames": ["00000"]},
        "2": {"category": "dog", "frames": ["00000"]},
    }}}}
    (train / "meta.json").write_text(json.dumps(train_meta))
    return frames


def test_seen_categories_from_train_meta(tmp_path):
    _make_ytb_vos(tmp_path)
    assert seen_categories_for(str(tmp_path)) == {"person", "dog"}


def test_ytb_vos_benchmark_end_to_end(tmp_path):
    frames = _make_ytb_vos(tmp_path)
    dataset = load_dataset("ytb_vos", str(tmp_path))
    video = dataset["vidA"]
    assert video["start_frame"] == {"1": 0, "2": 2}
    assert video["end_frame"] == {"1": 4, "2": 4}
    assert video["category"] == {"1": "person", "2": "lizard"}

    # 'perfect' reproduces the annotations; 'object2off' loses the unseen
    # object entirely but keeps object 1 exact
    res_root = tmp_path / "test"
    for tracker in ("perfect", "object2off"):
        out = res_root / "ytb_vos" / tracker / "vidA"
        out.mkdir(parents=True)
        for i, f in enumerate(frames):
            anno = np.array(Image.open(
                tmp_path / "ytb_vos" / "valid" / "Annotations" / "vidA"
                / f"{f}.png"))
            if tracker == "object2off":
                anno = anno * (anno != 2)
            Image.fromarray(anno).save(out / f"{f}.png")

    bench = YTBVOSBenchmark(dataset, str(res_root), data_dir=str(tmp_path))
    assert bench.seen_categories == {"person", "dog"}
    results = {}
    for t in ("perfect", "object2off"):
        results.update(bench.eval(t))
    summary = bench.summarize(results)

    # object 1 (person) is seen; object 2 (lizard) is unseen
    for t in ("perfect", "object2off"):
        assert summary[t]["J_seen"] == 1.0
        assert summary[t]["F_seen"] == 1.0
    assert summary["perfect"]["J_unseen"] == 1.0
    assert summary["perfect"]["F_unseen"] == 1.0
    assert summary["perfect"]["overall"] == 1.0
    # losing the unseen object zeroes exactly the unseen columns
    assert summary["object2off"]["J_unseen"] == 0.0
    assert summary["object2off"]["F_unseen"] == 0.0
    assert summary["object2off"]["overall"] == 0.5

    # per-object ranges: object 2 scored only on its frames after appearance
    obj2 = results["perfect"]["vidA"][2]
    assert obj2["category"] == "lizard" and not obj2["seen"]


def _make_sparse_ytb_vos(data_dir, n_frames=5):
    """Valid-split layout where object 2 is annotated only every OTHER merged
    frame (its meta.json frames list is sparse) while object 1 is dense, so
    the merged frame list is dense. On object 2's un-listed in-between frames
    the annotation PNG does NOT contain it (sparse annotation), but a correct
    tracker still predicts it there — per-range scoring would grade those
    predictions against empty gt (J=0); per-own-frames scoring must not."""
    valid = data_dir / "ytb_vos" / "valid"
    (valid / "JPEGImages" / "vidB").mkdir(parents=True)
    (valid / "Annotations" / "vidB").mkdir(parents=True)
    frames = [f"{5 * i:05d}" for i in range(n_frames)]
    obj2_frames = frames[::2]
    for i, f in enumerate(frames):
        im = np.zeros((H, W, 3), np.uint8)
        Image.fromarray(im).save(valid / "JPEGImages" / "vidB" / f"{f}.jpg")
        anno = _square(10, 10 + 2 * i, 20, 1)
        if f in obj2_frames:
            anno = _square(50, 60, 18, 2, anno)
        Image.fromarray(anno).save(valid / "Annotations" / "vidB" / f"{f}.png")
    meta = {"videos": {"vidB": {"objects": {
        "1": {"category": "person", "frames": frames},
        "2": {"category": "lizard", "frames": obj2_frames},
    }}}}
    (valid / "meta.json").write_text(json.dumps(meta))
    return frames, obj2_frames


def test_sparse_object_scored_only_on_its_own_frames(tmp_path):
    frames, obj2_frames = _make_sparse_ytb_vos(tmp_path)
    dataset = load_dataset("ytb_vos", str(tmp_path))
    assert dataset["vidB"]["obj_frames"] == {"1": [0, 1, 2, 3, 4],
                                             "2": [0, 2, 4]}

    # the tracker predicts object 2 on EVERY frame (correct behavior — the
    # object is present; only the annotation is sparse)
    out = tmp_path / "test" / "ytb_vos" / "trk" / "vidB"
    out.mkdir(parents=True)
    for i, f in enumerate(frames):
        pred = _square(10, 10 + 2 * i, 20, 1)
        pred = _square(50, 60, 18, 2, pred)
        Image.fromarray(pred).save(out / f"{f}.png")

    bench = YTBVOSBenchmark(dataset, str(tmp_path / "test"),
                            seen_categories={"person"},
                            data_dir=str(tmp_path))
    results = bench.eval("trk")
    # object 2's un-listed frames (indices 1, 3) carry empty gt for it; if
    # they were scored, J would be (1+0+1+0)/4 = 0.5 — per-protocol it is 1.0
    assert results["trk"]["vidB"][2]["J"] == 1.0
    assert results["trk"]["vidB"][2]["F"] == 1.0
    assert results["trk"]["vidB"][1]["J"] == 1.0


def test_missing_annotation_frames_skipped_with_warning(tmp_path, caplog):
    import logging

    frames = _make_ytb_vos(tmp_path)
    # simulate the real valid split's private gt: remove one in-range anno
    removed = (tmp_path / "ytb_vos" / "valid" / "Annotations" / "vidA"
               / f"{frames[2]}.png")
    removed_arr = np.array(Image.open(removed))
    dataset = load_dataset("ytb_vos", str(tmp_path))
    out = tmp_path / "test" / "ytb_vos" / "trk" / "vidA"
    out.mkdir(parents=True)
    for i, f in enumerate(frames):
        anno = np.array(Image.open(
            tmp_path / "ytb_vos" / "valid" / "Annotations" / "vidA"
            / f"{f}.png"))
        Image.fromarray(anno).save(out / f"{f}.png")
    removed.unlink()

    bench = YTBVOSBenchmark(dataset, str(tmp_path / "test"),
                            seen_categories={"person"},
                            data_dir=str(tmp_path))
    with caplog.at_level(logging.WARNING, logger="siammask_tpu"):
        results = bench.eval("trk")
    assert any("no ground-truth annotation" in r.getMessage()
               for r in caplog.records)
    # remaining frames still score perfectly — the missing frame is skipped,
    # not graded against an empty mask
    assert results["trk"]["vidA"][1]["J"] == 1.0
    assert results["trk"]["vidA"][2]["J"] == 1.0
    del removed_arr


def test_ytb_vos_split_fallback_marks_missing(tmp_path):
    frames = _make_ytb_vos(tmp_path)
    import shutil
    shutil.rmtree(tmp_path / "ytb_vos" / "train")
    dataset = load_dataset("ytb_vos", str(tmp_path))
    out = tmp_path / "test" / "ytb_vos" / "trk" / "vidA"
    out.mkdir(parents=True)
    for f in frames:
        anno = np.array(Image.open(
            tmp_path / "ytb_vos" / "valid" / "Annotations" / "vidA"
            / f"{f}.png"))
        Image.fromarray(anno).save(out / f"{f}.png")
    bench = YTBVOSBenchmark(dataset, str(tmp_path / "test"),
                            data_dir=str(tmp_path))
    assert bench.seen_categories is None
    summary = bench.summarize(bench.eval("trk"))
    assert summary["trk"]["split_source_missing"] is True
    assert summary["trk"]["J_seen"] == 1.0  # everything falls into seen
    assert summary["trk"]["J_unseen"] == 0.0
