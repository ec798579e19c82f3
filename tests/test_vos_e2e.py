"""End-to-end VOS test: synthetic DAVIS-layout mini dataset through the
multi-object driver (sequential and batched paths), fusion, and IoU meter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cv2
from PIL import Image

from siammask_tpu.config import TrackerConfig
from siammask_tpu.eval.datasets import load_dataset
from siammask_tpu.models.siammask import SiamMaskSharp
from siammask_tpu.tracker.runtime import TrackerRuntime
from siammask_tpu.tracker.vos import track_vos, track_vos_batched

HP = {"instance_size": 255, "out_size": 127, "base_size": 8, "seg_thr": 0.3,
      "penalty_k": 0.04, "window_influence": 0.4, "lr": 1.0}


def _make_davis(root, n_frames=4, h=120, w=160):
    video = "synth"
    (root / "ImageSets" / "2016").mkdir(parents=True)
    (root / "ImageSets" / "2017").mkdir(parents=True)
    (root / "JPEGImages" / "480p" / video).mkdir(parents=True)
    (root / "Annotations" / "480p" / video).mkdir(parents=True)
    rng = np.random.RandomState(3)
    for f in range(n_frames):
        im = rng.randint(0, 60, (h, w, 3), dtype=np.uint8)
        anno = np.zeros((h, w), dtype=np.uint8)
        # two moving objects
        x1, y1 = 30 + 2 * f, 25 + f
        x2, y2 = 100 - 2 * f, 70 - f
        im[y1:y1 + 30, x1:x1 + 25] = 200
        im[y2:y2 + 25, x2:x2 + 30] = 140
        anno[y1:y1 + 30, x1:x1 + 25] = 1
        anno[y2:y2 + 25, x2:x2 + 30] = 2
        cv2.imwrite(str(root / "JPEGImages" / "480p" / video / f"{f:05d}.jpg"), im)
        Image.fromarray(anno).save(
            str(root / "Annotations" / "480p" / video / f"{f:05d}.png"))
    for year in ("2016", "2017"):
        (root / "ImageSets" / year / "val.txt").write_text(video + "\n")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("davis_data")
    _make_davis(data_dir / "DAVIS")
    model = SiamMaskSharp()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, 255, 255, 3)))
    runtime = TrackerRuntime(model, variables, TrackerConfig().update(HP),
                             mask=True, refine=True)
    return data_dir, runtime


def test_vos_sequential(setup):
    data_dir, runtime = setup
    dataset = load_dataset("DAVIS2017", str(data_dir))
    video = dataset["synth"]
    assert len(video["image_files"]) == 4 and len(video["anno_files"]) == 4
    iou, fps = track_vos(runtime, video, mot_enable=True, log=lambda *_: None)
    iou = np.asarray(iou)
    assert iou.shape == (2, 4)  # 2 objects x 4 thresholds
    assert np.all((iou >= 0) & (iou <= 1))


def test_vos_batched_matches_protocol(setup):
    data_dir, runtime = setup
    dataset = load_dataset("DAVIS2017", str(data_dir))
    video = dataset["synth"]
    # per-frame driver (ragged tail: 3 frames < default scan_chunk)
    iou_b, fps_b = track_vos_batched(runtime, video, mot_enable=True,
                                     log=lambda *_: None)
    iou_b = np.asarray(iou_b)
    assert iou_b.shape == (2, 4)
    assert np.all((iou_b >= 0) & (iou_b <= 1))
    # scan driver (full 3-frame window -> ONE lax.scan program) agrees
    iou_s, _ = track_vos_batched(runtime, video, mot_enable=True,
                                 log=lambda *_: None, scan_chunk=3)
    np.testing.assert_allclose(np.asarray(iou_s), iou_b, rtol=1e-4, atol=1e-5)


def test_track_video_multi_scan(setup):
    """Whole-video multi-object scan produces the same shapes as frame stepping
    and consistent trajectories with the batched per-frame path."""
    data_dir, runtime = setup
    dataset = load_dataset("DAVIS2017", str(data_dir))
    video = dataset["synth"]
    frames = jnp.asarray(np.stack([cv2.imread(f) for f in video["image_files"]]),
                         jnp.float32)
    anno = np.array(Image.open(video["anno_files"][0]))
    pos, sz = [], []
    for o_id in (1, 2):
        x, y, w, h = cv2.boundingRect((anno == o_id).astype(np.uint8))
        pos.append([x + w / 2, y + h / 2])
        sz.append([w, h])

    tracker = runtime.tracker
    states = tracker.init_batched(runtime.variables, frames[0], np.array(pos),
                                  np.array(sz))
    final, outs = tracker.track_video_multi(runtime.variables, states, frames[1:])
    assert outs.mask_in_frame.shape == (3, 2, 120, 160)
    assert outs.target_pos.shape == (3, 2, 2)

    # per-frame batched stepping gives identical results
    st = states
    for t in range(1, 4):
        st, out_t = tracker.step_batched(runtime.variables, st, frames[t])
        np.testing.assert_allclose(np.asarray(outs.target_pos[t - 1]),
                                   np.asarray(out_t.target_pos), rtol=1e-5,
                                   atol=1e-3)


def test_vos_save_mask(setup, tmp_path):
    data_dir, runtime = setup
    dataset = load_dataset("DAVIS2016", str(data_dir))
    video = dataset["synth"]
    track_vos(runtime, video, mot_enable=False, result_dir=str(tmp_path),
              dataset="DAVIS2016", save_mask=True, log=lambda *_: None)
    outs = sorted((tmp_path / "DAVIS2016" / "SiamMask" / "synth").glob("*.png"))
    assert len(outs) == 4
    m = np.array(Image.open(outs[0]))
    assert m.shape == (120, 160)
