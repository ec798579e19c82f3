"""VOT benchmark driver: reset-on-failure protocol + result writing.

Protocol parity with `tools/test.py:318-418`: init from the axis-aligned
equivalent of the rotated gt box; per-frame overlap vs gt via the region kernel;
on zero overlap mark lost ([2]), skip 5 frames, re-init from gt; write
``<video>_001.txt`` with 1 / 2 / skip-0 markers or %.4f polygon lines.
"""
from __future__ import annotations

import time
from os import makedirs
from os.path import isdir, join

import cv2
import numpy as np

from siammask_tpu.eval.region import vot_float2str, vot_overlap
from siammask_tpu.utils.bbox import cxy_wh_2_rect, get_axis_aligned_bbox


def track_vot(runtime, video: dict, dataset: str = "VOT2018",
              mask_enable: bool = True, result_dir: str | None = None,
              tracker_name: str = "SiamMask", log=print):
    """runtime: TrackerRuntime; video: dict from eval.datasets.load_dataset.

    Returns (lost_times, fps)."""
    regions = []  # 1 init / 2 lost / 0 skip / polygon
    image_files, gt = video["image_files"], video["gt"]
    start_frame, lost_times, toc = 0, 0, 0.0
    location = None

    for f, image_file in enumerate(image_files):
        im = cv2.imread(image_file)
        tic = time.perf_counter()
        if f == start_frame:  # (re-)init from gt
            cx, cy, w, h = get_axis_aligned_bbox(gt[f])
            runtime.init(im, np.array([cx, cy]), np.array([w, h]))
            location = cxy_wh_2_rect(np.array([cx, cy]), np.array([w, h]))
            regions.append(1 if "VOT" in dataset else gt[f])
        elif f > start_frame:  # tracking
            out = runtime.track(im, soft_mask=False)
            if mask_enable:
                location = out["polygon"].flatten()
            else:
                location = cxy_wh_2_rect(out["target_pos"], out["target_sz"])

            if "VOT" in dataset:
                gt_polygon = tuple((gt[f][2 * i], gt[f][2 * i + 1]) for i in range(4))
                if mask_enable:
                    pred_polygon = tuple((location[2 * i], location[2 * i + 1])
                                         for i in range(4))
                else:
                    x, y, w, h = location
                    pred_polygon = ((x, y), (x + w, y), (x + w, y + h), (x, y + h))
                b_overlap = vot_overlap(
                    [c for p in gt_polygon for c in p],
                    [c for p in pred_polygon for c in p],
                    (im.shape[1], im.shape[0]))
            else:
                b_overlap = 1

            if b_overlap:
                regions.append(location)
            else:  # lost: skip 5 frames, re-init
                regions.append(2)
                lost_times += 1
                start_frame = f + 5
        else:  # skipped frame
            regions.append(0)
        toc += time.perf_counter() - tic

    if result_dir is not None:
        if "VOT" in dataset:
            video_path = join(result_dir, dataset, tracker_name, "baseline",
                              video["name"])
            if not isdir(video_path):
                makedirs(video_path)
            result_path = join(video_path, f"{video['name']}_001.txt")
            with open(result_path, "w") as fout:
                for x in regions:
                    if isinstance(x, int):
                        fout.write(f"{x:d}\n")
                    else:
                        fout.write(",".join(vot_float2str("%.4f", i)
                                            for i in x) + "\n")
        else:
            video_path = join(result_dir, dataset, tracker_name)
            if not isdir(video_path):
                makedirs(video_path)
            with open(join(video_path, f"{video['name']}.txt"), "w") as fout:
                for x in regions:
                    fout.write(",".join(str(i) for i in x) + "\n")

    fps = (len(image_files) - 1) / max(toc, 1e-9)
    log(f"Video: {video['name']:12s} Time: {toc:4.1f}s "
        f"Speed: {fps:5.1f}fps Lost: {lost_times}")
    return lost_times, fps
