"""YouTube-VOS J_s/J_u/F_s/F_u scorer.

The reference reports the four YouTube-VOS numbers in its README (reference
README.md:141) but contains no scorer — they come from the codalab evaluation
server. This module makes the framework self-contained: region similarity (J)
and boundary accuracy (F) per object, averaged within the *seen* and *unseen*
category splits, in BASELINE.md's ``J_s / J_u / F_s / F_u`` format.

Protocol (matching the official server semantics):

- Each object is scored on ITS annotated frame range — from the frame after its
  first appearance (the given init annotation is excluded) through its last
  annotated frame, using the per-object ``start_frame``/``end_frame`` indices
  the meta.json loader computes (`eval/datasets.py`; reference
  `utils/benchmark_helper.py:68-94` loads the same ranges).
- "Seen" categories are those present in the training split; "unseen" are
  val-only. The split is resolved from (in order): an explicit
  ``seen_categories`` argument, the training split's own ``meta.json``
  (categories that appear in training ARE the seen set, by definition), or a
  ``seen_categories.json`` list file next to the valid split. With no source
  available every category is scored as seen and the summary says so.
- Result masks are the fused PNGs ``track_vos`` writes (pixel value =
  object id), one per frame, in ``<result_root>/<dataset>/<tracker>/<video>/``.
"""
from __future__ import annotations

import json
import logging
from glob import glob
from os.path import exists, join

import numpy as np

from siammask_tpu.eval.davis import db_eval_boundary, db_eval_iou

logger = logging.getLogger("siammask_tpu")


def seen_categories_for(data_dir: str = "data") -> set | None:
    """Resolve the seen-category set for the ytb_vos valid split, or None.

    Seen = appears in the training split (that is the definition of the
    split), so the train meta.json is the authoritative offline source."""
    train_meta = join(data_dir, "ytb_vos", "train", "meta.json")
    if exists(train_meta):
        with open(train_meta) as f:
            videos = json.load(f)["videos"]
        return {o.get("category")
                for v in videos.values() for o in v["objects"].values()}
    listing = join(data_dir, "ytb_vos", "valid", "seen_categories.json")
    if exists(listing):
        with open(listing) as f:
            return set(json.load(f))
    return None


class YTBVOSBenchmark:
    """Scores saved ytb_vos result masks against the valid-split annotations."""

    def __init__(self, dataset: dict, result_root: str,
                 dataset_name: str = "ytb_vos",
                 seen_categories: set | None = None,
                 data_dir: str = "data"):
        self.dataset = dataset          # eval.datasets.load_dataset output
        self.dataset_name = dataset_name
        self.result_root = result_root
        if seen_categories is None:
            seen_categories = seen_categories_for(data_dir)
        self.seen_categories = seen_categories

    def eval(self, tracker_name: str) -> dict:
        """-> {video: {object_id: {"J": mean, "F": mean, "category": str,
        "seen": bool}}} over each object's annotated range."""
        from PIL import Image

        out = {}
        for name, video in self.dataset.items():
            pred_dir = join(self.result_root, self.dataset_name, tracker_name,
                            name)
            pred_files = sorted(glob(join(pred_dir, "*.png")))
            if len(pred_files) != len(video["anno_files"]):
                continue        # incomplete result dir — skip like the toolkit
            annos = [np.array(Image.open(x)) for x in video["anno_files"]]
            preds = [np.array(Image.open(x)) for x in pred_files]

            video_res = {}
            for obj, start in video["start_frame"].items():
                end = video["end_frame"][obj]
                o_id = int(obj)
                j_scores, f_scores = [], []
                for t in range(start + 1, end + 1):
                    # valid-split annotations exist only on the object's
                    # annotated frames; frames without the object annotated
                    # within its range still count (empty gt vs prediction)
                    gt = annos[t] == o_id
                    pred = preds[t] == o_id
                    j_scores.append(db_eval_iou(pred, gt))
                    f_scores.append(db_eval_boundary(pred, gt))
                if not j_scores:
                    continue    # single-frame object: nothing after init
                cat = video.get("category", {}).get(obj)
                seen = (self.seen_categories is None
                        or cat in self.seen_categories)
                video_res[o_id] = {"J": float(np.mean(j_scores)),
                                   "F": float(np.mean(f_scores)),
                                   "category": cat, "seen": bool(seen)}
            out[name] = video_res
        return {tracker_name: out}

    def summarize(self, results: dict) -> dict:
        """-> {tracker: {"J_seen", "J_unseen", "F_seen", "F_unseen",
        "overall"}} — the server's headline layout (overall = mean of the
        four, the G-mean)."""
        summary = {}
        for tracker, videos in results.items():
            js, ju, fs, fu = [], [], [], []
            for video_res in videos.values():
                for obj_res in video_res.values():
                    (js if obj_res["seen"] else ju).append(obj_res["J"])
                    (fs if obj_res["seen"] else fu).append(obj_res["F"])
            mean = lambda v: float(np.mean(v)) if v else 0.0
            entry = {"J_seen": mean(js), "J_unseen": mean(ju),
                     "F_seen": mean(fs), "F_unseen": mean(fu)}
            entry["overall"] = float(np.mean(list(entry.values())))
            if self.seen_categories is None:
                entry["split_source_missing"] = True
                logger.warning(
                    "ytb_vos seen/unseen split unavailable (no train "
                    "meta.json or seen_categories.json) — all objects "
                    "scored as seen")
            summary[tracker] = entry
        return summary

    @staticmethod
    def show_result(summary: dict, log=print):
        for tracker, s in summary.items():
            log(f"{tracker}: J_s {s['J_seen']:.3f} / J_u {s['J_unseen']:.3f} "
                f"/ F_s {s['F_seen']:.3f} / F_u {s['F_unseen']:.3f} "
                f"(overall {s['overall']:.3f})")
