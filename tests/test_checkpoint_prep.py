"""Checkpoint roundtrip + data-prep pipeline tests (synthetic data)."""
import json
import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siammask_tpu.data.dataset import Augmentation, PairDataset, SubDataset, collate
from siammask_tpu.data.prep import crop_like_siamfc, gen_json_coco
from siammask_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from siammask_tpu.utils.bbox import Corner
from tests._tiny_model import TinySiamMask


def test_checkpoint_roundtrip(tmp_path):
    model = TinySiamMask()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, 143, 143, 3)), method="forward_train")
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, variables, epoch=7, arch="Tiny",
                    anchor_cfg={"stride": 8, "ratios": [1], "scales": [8]})
    ck = load_checkpoint(path)
    assert ck["epoch"] == 7 and ck["arch"] == "Tiny"
    assert ck["anchor_cfg"]["stride"] == 8
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["rpn"]["cls"]["kernel"]),
        ck["variables"]["params"]["rpn"]["cls"]["kernel"])


def _make_crop_dataset(tmp_path, n_videos=3, n_frames=4, size=511):
    """Synthetic pre-cropped dataset in the reference layout."""
    root = tmp_path / "crop511"
    anno = {}
    rng = np.random.RandomState(0)
    for v in range(n_videos):
        video = f"video_{v}"
        (root / video).mkdir(parents=True)
        tracks = {}
        for t in range(2):
            frames = {}
            for f in range(n_frames):
                img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                cv2.imwrite(str(root / video / f"{f:06d}.{t:02d}.x.jpg"), img)
                mask = np.zeros((size, size), np.uint8)
                mask[200:300, 220:320] = 255
                cv2.imwrite(str(root / video / f"{f:06d}.{t:02d}.m.png"), mask)
                frames[f"{f:06d}"] = [200.0, 210.0, 320.0, 310.0]
            tracks[f"{t:02d}"] = frames
        anno[video] = tracks
    anno_file = tmp_path / "train.json"
    anno_file.write_text(json.dumps(anno))
    return str(root), str(anno_file)


def test_pair_dataset_pipeline(tmp_path):
    root, anno = _make_crop_dataset(tmp_path)
    cfg = {
        "datasets": {"coco": {"root": root, "anno": anno, "frame_range": 2}},
        "template_size": 127, "search_size": 143, "base_size": 0, "size": 3,
        "num": 8,
        "augmentation": {
            "template": {"shift": 4, "scale": 0.05},
            "search": {"shift": 8, "scale": 0.18, "blur": 0.18},
            "neg": 0.2, "gray": 0.25,
        },
    }
    anchors = {"stride": 8, "ratios": [0.33, 0.5, 1, 2, 3], "scales": [8]}
    ds = PairDataset(cfg, anchors)
    assert len(ds) == 8
    samples = [ds[i] for i in range(4)]
    batch = collate(samples)
    assert batch["template"].shape == (4, 127, 127, 3)
    assert batch["search"].shape == (4, 143, 143, 3)
    assert batch["label_cls"].shape == (4, 5, 3, 3)
    assert batch["label_loc"].shape == (4, 4, 5, 3, 3)
    assert batch["label_mask"].shape == (4, 143, 143)
    assert set(np.unique(batch["label_mask"])) <= {-1.0, 1.0}
    assert set(np.unique(batch["label_cls"])) <= {-1, 0, 1}
    # positives carry delta weight
    for s in samples:
        if (s.cls == 1).any():
            assert s.delta_weight.max() > 0


def test_subdataset_filtering(tmp_path):
    anno = {"v1": {"00": {"000000": [0, 0, 10, 10], "000001": [0, 0, 0, 0]}},
            "v2": {"00": {"000000": [0, 0, 0, 10]}}}
    f = tmp_path / "a.json"
    f.write_text(json.dumps(anno))
    sub = SubDataset({"root": "/", "anno": str(f), "mark": "vid"})
    # zero-sized boxes filtered; v2 dropped entirely
    assert sub.videos == ["v1"]
    assert sub.labels["v1"]["00"]["frames"] == [0]


def test_augmentation_keeps_box_consistent():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (511, 511, 3), dtype=np.uint8)
    aug = Augmentation({"shift": 8, "scale": 0.18})
    box = Corner(200.0, 210.0, 320.0, 310.0)
    out, bbox, _ = aug(img, box, 255)
    assert out.shape == (255, 255, 3)
    # box stays within the crop
    assert -50 < bbox.x1 < 305 and -50 < bbox.y1 < 305


def test_crop_like_siamfc_shape():
    img = np.zeros((480, 640, 3), np.uint8)
    out = crop_like_siamfc(img, [100, 100, 200, 200], search_size=511)
    assert out.shape == (511, 511, 3)


def test_gen_json_coco(tmp_path):
    coco_dir = tmp_path / "coco"
    (coco_dir / "annotations").mkdir(parents=True)
    data = {
        "images": [{"id": 1, "file_name": "000000000001.jpg",
                    "height": 100, "width": 100}],
        "annotations": [{"id": 10, "image_id": 1, "bbox": [10, 20, 30, 40],
                         "segmentation": [[10, 20, 40, 20, 40, 60, 10, 60]]}],
    }
    (coco_dir / "annotations" / "instances_val2017.json").write_text(
        json.dumps(data))
    out = gen_json_coco(str(coco_dir), subsets=("val2017",))
    assert "val2017/000000000001" in out
    assert out["val2017/000000000001"]["00"]["000000"] == [10, 20, 39, 59]
