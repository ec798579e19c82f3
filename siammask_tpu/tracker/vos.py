"""VOS benchmark driver: multi-object semi-supervised segmentation.

Protocol parity with `tools/test.py:421-542`: each object id from the init
annotation runs an independent tracker pass over the video; per-object soft
masks are fused by argmax over objects gated by max>thr; scored with the
multi-object IoU meter over thresholds 0.3..0.5.
"""
from __future__ import annotations

import time
from os import makedirs
from os.path import isdir, join

import cv2
import numpy as np
from PIL import Image

THRS = np.arange(0.3, 0.5, 0.05)


def multi_batch_iou(thrs, outputs, targets, start=None, end=None):
    """Per-object mean IoU of the fused prediction at each threshold
    (MultiBatchIouMeter, tools/test.py:421-456)."""
    targets = np.array(targets)
    outputs = np.array(outputs)
    num_frame = targets.shape[0]
    if start is None:
        object_ids = np.arange(outputs.shape[0]) + 1
    else:
        object_ids = [int(i) for i in start]

    num_object = len(object_ids)
    res = np.zeros((num_object, len(thrs)), dtype=np.float32)

    output_max_id = np.argmax(outputs, axis=0).astype("uint8") + 1
    outputs_max = np.max(outputs, axis=0)
    for k, thr in enumerate(thrs):
        output_thr = outputs_max > thr
        for j in range(num_object):
            target_j = targets == object_ids[j]
            if start is None:
                start_frame, end_frame = 1, num_frame - 1
            else:
                start_frame = start[str(object_ids[j])] + 1
                end_frame = end[str(object_ids[j])] - 1
            iou = []
            for i in range(start_frame, end_frame):
                pred = (output_thr[i] * output_max_id[i]) == (j + 1)
                inter = np.sum(pred & (target_j[i] > 0))
                union = np.sum(pred | (target_j[i] > 0))
                if union > 0:
                    iou.append(inter / union)
                else:
                    iou.append(1)
            res[j, k] = np.mean(iou) if iou else 0.0
    return res


def track_vos_batched(runtime, video: dict, mot_enable: bool = True,
                      result_dir: str | None = None, dataset: str = "DAVIS2016",
                      tracker_name: str = "SiamMask", save_mask: bool = False,
                      log=print, scan_chunk: int = 32):
    """Batched multi-object VOS: all objects advance together via the tracker's
    vmapped step, and full ``scan_chunk``-frame windows run through
    ``track_video_multi`` — ONE lax.scan device program per chunk with zero
    per-frame host dispatch; the host decodes chunk t+1 and drains chunk t-1's
    masks while the device scans chunk t. The ragged tail steps per-frame so
    every video shares the same two compiled programs. Only valid when all
    objects span the whole video (DAVIS); falls back to the sequential path
    otherwise (YouTube-VOS per-object start/end frames)."""
    import jax.numpy as jnp

    if "start_frame" in video:
        return track_vos(runtime, video, mot_enable, result_dir, dataset,
                         tracker_name, save_mask, log)

    image_files = video["image_files"]
    annos = [np.array(Image.open(x)) for x in video["anno_files"]]
    if not mot_enable:
        annos = [(a > 0).astype(np.uint8) for a in annos]
    anno_init = annos[0]
    object_ids = [int(o) for o in np.unique(anno_init) if o != 0]
    object_num = len(object_ids)

    pos0, sz0 = [], []
    for o_id in object_ids:
        x, y, bw, bh = cv2.boundingRect((anno_init == o_id).astype(np.uint8))
        pos0.append([x + bw / 2, y + bh / 2])
        sz0.append([bw, bh])

    tracker = runtime.tracker
    variables = runtime.variables
    toc = 0.0
    tic = time.perf_counter()
    # uint8 upload: 4x cheaper H2D than fp32, and the on-device per-frame
    # slice of the stacked video reads 4x less HBM; the jitted step casts
    # (tracks bit-identically — tests/test_tracker_slow.py)
    frame0 = jnp.asarray(cv2.imread(image_files[0]))
    states = tracker.init_batched(variables, frame0, np.array(pos0),
                                  np.array(sz0))
    toc += time.perf_counter() - tic

    h, w = anno_init.shape
    pred_masks = np.full((object_num, len(image_files), h, w), -1.0,
                         dtype=np.float32)
    for o in range(object_num):
        pred_masks[o, 0] = (anno_init == object_ids[o]).astype(np.float32)

    def materialize(slot):
        fs, masks = slot
        m = np.asarray(masks)                       # blocks on that chunk
        if m.ndim == 3:                             # (O, H, W) single frame
            m = m[None]
        pred_masks[:, fs:fs + m.shape[0]] = m.transpose(1, 0, 2, 3)

    pending = None
    f, n = 1, len(image_files)
    while f < n:
        end = min(f + scan_chunk, n)
        imgs = np.stack([cv2.imread(image_files[i]) for i in range(f, end)])
        tic = time.perf_counter()
        if end - f == scan_chunk:                   # full window: one scan
            states, outs = tracker.track_video_multi(
                variables, states, jnp.asarray(imgs))
            chunk_masks = [outs.mask_in_frame]      # (T, O, H, W)
        else:                                       # ragged tail: per-frame
            chunk_masks = []
            for i in range(imgs.shape[0]):
                states, o = tracker.step_batched(
                    variables, states, jnp.asarray(imgs[i]))
                chunk_masks.append(o.mask_in_frame)
        if pending is not None:
            materialize(pending)
        toc += time.perf_counter() - tic
        for masks in chunk_masks:
            pending = (f, masks)
            f += masks.shape[0] if masks.ndim == 4 else 1
            if masks is not chunk_masks[-1]:
                materialize(pending)
    if pending is not None:
        tic = time.perf_counter()
        materialize(pending)
        toc += time.perf_counter() - tic

    if len(annos) == len(image_files):
        multi_mean_iou = multi_batch_iou(THRS, pred_masks, annos)
        for i in range(object_num):
            for j, thr in enumerate(THRS):
                log(f"Fusion Multi Object {video['name']}_{i + 1:d} "
                    f"IOU at {thr:.2f}: {multi_mean_iou[i, j]:.4f}")
    else:
        multi_mean_iou = []

    if save_mask and result_dir is not None:
        video_path = join(result_dir, dataset, tracker_name, video["name"])
        if not isdir(video_path):
            makedirs(video_path)
        fused = (np.argmax(pred_masks, axis=0).astype("uint8") + 1) * \
            (np.max(pred_masks, axis=0) > runtime.p.seg_thr).astype("uint8")
        for i in range(fused.shape[0]):
            name = image_files[i].split("/")[-1].split(".")[0] + ".png"
            cv2.imwrite(join(video_path, name), fused[i])

    n_steps = (len(image_files) - 1) * object_num
    fps = n_steps / max(toc, 1e-9)
    log(f"Video: {video['name']:12s} Time: {toc:4.1f}s Speed: {fps:5.1f}fps "
        f"(batched x{object_num})")
    return multi_mean_iou, fps


def track_vos(runtime, video: dict, mot_enable: bool = True,
              result_dir: str | None = None, dataset: str = "DAVIS2016",
              tracker_name: str = "SiamMask", save_mask: bool = False,
              log=print):
    """runtime: TrackerRuntime (mask path). Returns (multi_mean_iou, fps)."""
    image_files = video["image_files"]
    annos = [np.array(Image.open(x)) for x in video["anno_files"]]
    if "anno_init_files" in video:
        annos_init = [np.array(Image.open(x)) for x in video["anno_init_files"]]
    else:
        annos_init = [annos[0]]

    if not mot_enable:  # single-object mode: everything is object 1
        annos = [(a > 0).astype(np.uint8) for a in annos]
        annos_init = [(a > 0).astype(np.uint8) for a in annos_init]

    if "start_frame" in video:
        object_ids = [int(i) for i in video["start_frame"]]
    else:
        object_ids = [int(o) for o in np.unique(annos[0]) if o != 0]
        if len(object_ids) != len(annos_init):
            annos_init = annos_init * len(object_ids)
    object_num = len(object_ids)

    toc = 0.0
    h, w = annos[0].shape[0], annos[0].shape[1]
    pred_masks = np.full((object_num, len(image_files), h, w), -1.0,
                         dtype=np.float32)

    for obj_idx, o_id in enumerate(object_ids):
        if "start_frame" in video:
            start_frame = video["start_frame"][str(o_id)]
            end_frame = video["end_frame"][str(o_id)]
        else:
            start_frame, end_frame = 0, len(image_files)

        mask = None
        for f, image_file in enumerate(image_files):
            im = cv2.imread(image_file)
            tic = time.perf_counter()
            if f == start_frame:  # init from the object's annotation rect
                obj_mask = annos_init[obj_idx] == o_id
                x, y, bw, bh = cv2.boundingRect(obj_mask.astype(np.uint8))
                runtime.init(im, np.array([x + bw / 2, y + bh / 2]),
                             np.array([bw, bh]))
                mask = obj_mask.astype(np.float32)
            elif end_frame >= f > start_frame:
                out = runtime.track(im)
                mask = out["mask"]
            toc += time.perf_counter() - tic
            if end_frame >= f >= start_frame and mask is not None:
                pred_masks[obj_idx, f] = mask

    if len(annos) == len(image_files):
        multi_mean_iou = multi_batch_iou(
            THRS, pred_masks, annos,
            start=video.get("start_frame"), end=video.get("end_frame"))
        for i in range(object_num):
            for j, thr in enumerate(THRS):
                log(f"Fusion Multi Object {video['name']}_{i + 1:d} "
                    f"IOU at {thr:.2f}: {multi_mean_iou[i, j]:.4f}")
    else:
        multi_mean_iou = []

    if save_mask and result_dir is not None:
        video_path = join(result_dir, dataset, tracker_name, video["name"])
        if not isdir(video_path):
            makedirs(video_path)
        fused = (np.argmax(pred_masks, axis=0).astype("uint8") + 1) * \
            (np.max(pred_masks, axis=0) > runtime.p.seg_thr).astype("uint8")
        for i in range(fused.shape[0]):
            name = image_files[i].split("/")[-1].split(".")[0] + ".png"
            cv2.imwrite(join(video_path, name), fused[i])

    n_steps = (len(image_files) - 1) * len(object_ids)
    fps = n_steps / max(toc, 1e-9)
    log(f"Video: {video['name']:12s} Time: {toc:4.1f}s Speed: {fps:5.1f}fps")
    return multi_mean_iou, fps
