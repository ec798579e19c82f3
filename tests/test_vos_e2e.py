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


def _make_ytb_vos_valid(root, n_frames=5, h=120, w=160):
    """ytb_vos valid layout: object 1 spans all frames, object 2 appears at
    frame index 2 (ranged objects -> the batched path must cut the scan at the
    late start and re-init that stream in place)."""
    import json

    valid = root / "ytb_vos" / "valid"
    (valid / "JPEGImages" / "vid").mkdir(parents=True)
    (valid / "Annotations" / "vid").mkdir(parents=True)
    rng = np.random.RandomState(5)
    frames = [f"{5 * i:05d}" for i in range(n_frames)]
    for i, f in enumerate(frames):
        im = rng.randint(0, 60, (h, w, 3), dtype=np.uint8)
        anno = np.zeros((h, w), dtype=np.uint8)
        x1, y1 = 30 + 2 * i, 25 + i
        im[y1:y1 + 30, x1:x1 + 25] = 200
        anno[y1:y1 + 30, x1:x1 + 25] = 1
        if i >= 2:
            x2, y2 = 100 - 2 * i, 70 - i
            im[y2:y2 + 25, x2:x2 + 30] = 140
            anno[y2:y2 + 25, x2:x2 + 30] = 2
        cv2.imwrite(str(valid / "JPEGImages" / "vid" / f"{f}.jpg"), im)
        Image.fromarray(anno).save(str(valid / "Annotations" / "vid" / f"{f}.png"))
    meta = {"videos": {"vid": {"objects": {
        "1": {"category": "person", "frames": frames},
        "2": {"category": "lizard", "frames": frames[2:]},
    }}}}
    (valid / "meta.json").write_text(json.dumps(meta))


def test_vos_batched_ranged_objects(setup, tmp_path):
    """The range-aware batched path handles per-object start/end frames:
    streams are masked before their start, re-initialized from gt at their
    start frame, and chunk-boundary placement doesn't change results."""
    data_dir, runtime = setup
    _make_ytb_vos_valid(tmp_path)
    dataset = load_dataset("ytb_vos", str(tmp_path))
    video = dataset["vid"]
    assert video["start_frame"] == {"1": 0, "2": 2}

    iou_seq, _ = track_vos(runtime, video, mot_enable=True,
                           log=lambda *_: None)
    out_b = tmp_path / "res_b"
    iou_b, _ = track_vos_batched(runtime, video, mot_enable=True,
                                 result_dir=str(out_b), dataset="ytb_vos",
                                 save_mask=True, log=lambda *_: None)
    iou_seq, iou_b = np.asarray(iou_seq), np.asarray(iou_b)
    # same protocol scoring shape as the sequential driver; valid scores
    assert iou_b.shape == iou_seq.shape == (2, 4)
    assert np.all((iou_b >= 0) & (iou_b <= 1))

    # scan-window placement is semantics-free: a 2-frame scan chunk forces
    # windows to straddle the segment cuts differently — identical masks
    iou_b2, _ = track_vos_batched(runtime, video, mot_enable=True,
                                  log=lambda *_: None, scan_chunk=2)
    np.testing.assert_allclose(np.asarray(iou_b2), iou_b, rtol=1e-4, atol=1e-5)

    # fused result PNGs: object 2 must be absent before its start frame and
    # present exactly at its gt init rect on the start frame
    fused = [np.array(Image.open(out_b / "ytb_vos" / "SiamMask" / "vid"
                                 / f"{5 * i:05d}.png")) for i in range(5)]
    assert not (fused[0] == 2).any() and not (fused[1] == 2).any()
    gt2 = np.array(Image.open(tmp_path / "ytb_vos" / "valid" / "Annotations"
                              / "vid" / "00010.png")) == 2
    assert (fused[2][gt2] == 2).all()
