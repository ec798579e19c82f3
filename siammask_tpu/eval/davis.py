"""DAVIS J&F evaluation: region similarity (J) and boundary accuracy (F).

The reference reports DAVIS J/F in its README (README.md:141) but contains no
evaluator — those numbers come from the external DAVIS toolkit run over the
masks `tools/test.py --save_mask` writes. This module makes the framework
self-contained: the same J (per-frame mask IoU) and F (boundary precision/
recall with a distance tolerance of 0.008x the image diagonal, using the
official `f_boundary.py` machinery: the ``seg2bmap`` neighbor-XOR boundary
map and an exact L2-disk dilation) plus the toolkit's mean / recall / decay
statistics. Differential-tested against a per-pixel transcription of the
official formula (tests/test_davis_eval.py).

Protocol notes (matching the official toolkit):
- frames 0 (the given annotation) and the last frame are excluded;
- recall is the fraction of frames above 0.5;
- decay is the drop from the first to the last quarter of the video;
- DAVIS2016 is single-object (any nonzero id), DAVIS2017 scores each object id
  separately and averages.
"""
from __future__ import annotations

from glob import glob
from os.path import join

import cv2
import numpy as np


def db_eval_iou(segmentation: np.ndarray, annotation: np.ndarray) -> float:
    """Per-frame region similarity J: IoU of binary masks (1.0 when both
    empty, as the toolkit defines void frames)."""
    seg = segmentation > 0
    ann = annotation > 0
    union = np.count_nonzero(seg | ann)
    if union == 0:
        return 1.0
    return np.count_nonzero(seg & ann) / union


def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """The official toolkit's boundary map (f_boundary.py seg2bmap, same-size
    path): a pixel is boundary iff it differs from its east, south, or
    south-east neighbor, with the last row/column compared against the
    out-of-image zero padding only along their remaining direction and the
    corner forced off."""
    seg = (seg > 0)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def _l2_disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: pixels within L2 distance ``radius``."""
    yy, xx = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    return (xx * xx + yy * yy <= radius * radius).astype(np.uint8)


def db_eval_boundary(segmentation: np.ndarray, annotation: np.ndarray,
                     bound_th: float = 0.008) -> float:
    """Boundary F-measure: precision/recall of the predicted boundary against
    the ground-truth boundary, each tolerance-dilated by
    ceil(bound_th * image diagonal) pixels (official f_boundary.py)."""
    h, w = annotation.shape[:2]
    bound_pix = int(np.ceil(bound_th * np.linalg.norm([h, w])))

    fg_b = seg2bmap(segmentation)
    gt_b = seg2bmap(annotation)
    if not fg_b.any() and not gt_b.any():
        return 1.0
    if not fg_b.any() or not gt_b.any():
        return 0.0

    disk = _l2_disk(bound_pix)
    fg_dil = cv2.dilate(fg_b.astype(np.uint8), disk).astype(bool)
    gt_dil = cv2.dilate(gt_b.astype(np.uint8), disk).astype(bool)

    precision = np.count_nonzero(fg_b & gt_dil) / np.count_nonzero(fg_b)
    recall = np.count_nonzero(gt_b & fg_dil) / np.count_nonzero(gt_b)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def statistics(per_frame: np.ndarray) -> dict:
    """Toolkit statistics over one object's per-frame scores:
    mean, recall (> 0.5), decay (first-quarter mean - last-quarter mean)."""
    per_frame = np.asarray(per_frame, dtype=np.float64)
    if per_frame.size == 0:
        return {"mean": 0.0, "recall": 0.0, "decay": 0.0}
    bins = np.array_split(per_frame, 4)
    return {
        "mean": float(per_frame.mean()),
        "recall": float(np.mean(per_frame > 0.5)),
        "decay": float(bins[0].mean() - bins[-1].mean()),
    }


class DAVISBenchmark:
    """Scores saved result masks (``tools/test.py --save_mask`` fused PNGs:
    pixel value = object id) against the dataset annotations."""

    def __init__(self, dataset: dict, dataset_name: str, result_root: str):
        self.dataset = dataset          # eval.datasets.load_dataset output
        self.dataset_name = dataset_name
        self.result_root = result_root
        self.multi_object = not dataset_name.startswith("DAVIS2016")

    def eval(self, tracker_name: str) -> dict:
        """-> {tracker: {video: {object_id: {"J": stats, "F": stats}}}}."""
        from PIL import Image

        out = {}
        for name, video in self.dataset.items():
            annos = [np.array(Image.open(x)) for x in video["anno_files"]]
            pred_dir = join(self.result_root, self.dataset_name, tracker_name,
                            name)
            pred_files = sorted(glob(join(pred_dir, "*.png")))
            if len(pred_files) != len(video["image_files"]):
                continue        # incomplete result dir — skip like the toolkit
            preds = [np.array(Image.open(x)) for x in pred_files]

            if self.multi_object:
                object_ids = [int(o) for o in np.unique(annos[0]) if o != 0]
            else:
                object_ids = [1]
                annos = [(a > 0).astype(np.uint8) for a in annos]

            video_res = {}
            for o_id in object_ids:
                j_scores, f_scores = [], []
                # exclude the given first frame and the last frame
                for t in range(1, len(annos) - 1):
                    pred = preds[t] == o_id
                    gt = annos[t] == o_id
                    j_scores.append(db_eval_iou(pred, gt))
                    f_scores.append(db_eval_boundary(pred, gt))
                video_res[o_id] = {"J": statistics(np.array(j_scores)),
                                   "F": statistics(np.array(f_scores))}
            out[name] = video_res
        return {tracker_name: out}

    @staticmethod
    def summarize(results: dict) -> dict:
        """-> {tracker: {"J_mean", "J_recall", "J_decay", "F_mean", ...}}
        averaged over every (video, object)."""
        summary = {}
        for tracker, videos in results.items():
            agg = {k: [] for k in ("J_mean", "J_recall", "J_decay",
                                   "F_mean", "F_recall", "F_decay")}
            for video_res in videos.values():
                for obj_res in video_res.values():
                    for m in ("J", "F"):
                        for s in ("mean", "recall", "decay"):
                            agg[f"{m}_{s}"].append(obj_res[m][s])
            summary[tracker] = {k: float(np.mean(v)) if v else 0.0
                                for k, v in agg.items()}
        return summary
