"""Offline data preparation: pre-crop training images + build anno JSONs.

Re-implements the reference `data/{coco,vid,det,ytb_vos}/par_crop.py` and
`gen_json.py` pipelines: every annotated object becomes a 511x511 search-region
crop (SiamFC context formula) named ``{frame:06d}.{track}.x.jpg`` with an
optional ``.m.png`` mask, plus a train.json of
``{video: {track: {frame: [x1, y1, x2, y2]}}}``.

COCO masks decode through our C++ RLE codec (data/rle.py); a minimal COCO
annotation reader replaces the vendored pycocotools API.
"""
from __future__ import annotations

import json
from concurrent import futures
from os import makedirs
from os.path import isdir, join

import cv2
import numpy as np

from siammask_tpu.data import rle as rle_codec


def crop_hwc(image, bbox, out_sz, padding=(0, 0, 0)):
    a = (out_sz - 1) / (bbox[2] - bbox[0])
    b = (out_sz - 1) / (bbox[3] - bbox[1])
    mapping = np.array([[a, 0, -a * bbox[0]], [0, b, -b * bbox[1]]],
                       dtype=np.float64)
    return cv2.warpAffine(image, mapping, (out_sz, out_sz),
                          borderMode=cv2.BORDER_CONSTANT, borderValue=padding)


def pos_s_to_bbox(pos, s):
    return [pos[0] - s / 2, pos[1] - s / 2, pos[0] + s / 2, pos[1] + s / 2]


def crop_like_siamfc(image, bbox, exemplar_size=127, context_amount=0.5,
                     search_size=511, padding=(0, 0, 0)):
    """SiamFC-context crop of the (corner) bbox region to search_size
    (par_crop.py:63-75)."""
    target_pos = [(bbox[2] + bbox[0]) / 2.0, (bbox[3] + bbox[1]) / 2.0]
    target_size = [bbox[2] - bbox[0] + 1, bbox[3] - bbox[1] + 1]
    wc_z = target_size[1] + context_amount * sum(target_size)
    hc_z = target_size[0] + context_amount * sum(target_size)
    s_z = np.sqrt(wc_z * hc_z)
    scale_z = exemplar_size / s_z
    pad = (search_size - exemplar_size) / 2 / scale_z
    s_x = s_z + 2 * pad
    return crop_hwc(image, pos_s_to_bbox(target_pos, s_x), search_size, padding)


class CocoAnnotations:
    """Minimal COCO instances reader (replaces the vendored pycocotools API)."""

    def __init__(self, anno_file: str):
        with open(anno_file) as f:
            data = json.load(f)
        self.imgs = {img["id"]: img for img in data["images"]}
        self.img_anns: dict[int, list] = {i: [] for i in self.imgs}
        for ann in data["annotations"]:
            self.img_anns.setdefault(ann["image_id"], []).append(ann)

    def ann_to_mask(self, ann, img) -> np.ndarray:
        return rle_codec.ann_to_mask(ann, img["height"], img["width"])


def crop_coco_image(coco: CocoAnnotations, img_id: int, img_base: str,
                    crop_base: str, search_size=511, enable_mask=True):
    """Crop every annotation of one COCO image (par_crop.py:78-99)."""
    img = coco.imgs[img_id]
    anns = coco.img_anns.get(img_id, [])
    stem = img["file_name"].split("/")[-1].split(".")[0]
    out_dir = join(crop_base, stem)
    if not isdir(out_dir):
        makedirs(out_dir)
    im = cv2.imread(join(img_base, img["file_name"]))
    avg_chans = np.mean(im, axis=(0, 1))
    for track_id, ann in enumerate(anns):
        rect = ann["bbox"]
        if rect[2] <= 0 or rect[3] <= 0:
            continue
        bbox = [rect[0], rect[1], rect[0] + rect[2] - 1, rect[1] + rect[3] - 1]
        x = crop_like_siamfc(im, bbox, search_size=search_size, padding=avg_chans)
        cv2.imwrite(join(out_dir, f"{0:06d}.{track_id:02d}.x.jpg"), x)
        if enable_mask and "segmentation" in ann:
            mask = coco.ann_to_mask(ann, img).astype(np.float32)
            xm = (crop_like_siamfc(mask, bbox, search_size=search_size) > 0.5)
            cv2.imwrite(join(out_dir, f"{0:06d}.{track_id:02d}.m.png"),
                        xm.astype(np.uint8) * 255)


def prep_coco(data_dir: str, crop_path: str | None = None, search_size=511,
              enable_mask=True, num_workers=16, subsets=("val2017", "train2017")):
    """Full COCO crop pass (par_crop.py:102-123) with process fan-out."""
    crop_path = crop_path or join(data_dir, f"crop{search_size}")
    for subset in subsets:
        coco = CocoAnnotations(join(data_dir, "annotations",
                                    f"instances_{subset}.json"))
        crop_base = join(crop_path, subset)
        img_base = join(data_dir, subset)
        with futures.ProcessPoolExecutor(max_workers=num_workers) as ex:
            list(ex.map(_crop_coco_star,
                        [(coco, i, img_base, crop_base, search_size, enable_mask)
                         for i in coco.imgs]))


def _crop_coco_star(args):
    return crop_coco_image(*args)


def gen_json_coco(data_dir: str, out_file: str | None = None,
                  subsets=("train2017", "val2017")):
    """COCO -> train.json {video: {track: {frame: corner_bbox}}}
    (data/coco/gen_json.py semantics: one video per image, frame '000000')."""
    out = {}
    for subset in subsets:
        coco = CocoAnnotations(join(data_dir, "annotations",
                                    f"instances_{subset}.json"))
        for img_id, img in coco.imgs.items():
            stem = f"{subset}/{img['file_name'].split('/')[-1].split('.')[0]}"
            tracks = {}
            for track_id, ann in enumerate(coco.img_anns.get(img_id, [])):
                rect = ann["bbox"]
                if rect[2] <= 0 or rect[3] <= 0:
                    continue
                tracks[f"{track_id:02d}"] = {
                    "000000": [rect[0], rect[1],
                               rect[0] + rect[2] - 1, rect[1] + rect[3] - 1]}
            if tracks:
                out[stem] = tracks
    if out_file:
        with open(out_file, "w") as f:
            json.dump(out, f, indent=2)
    return out


def crop_video_frames(frames: list, annos: dict, out_dir: str,
                      search_size=511, masks: dict | None = None):
    """Generic video cropper: frames = [(frame_idx, image_path)], annos =
    {frame_idx: {track_id: corner_bbox}} (vid/ytb_vos par_crop shape)."""
    if not isdir(out_dir):
        makedirs(out_dir)
    for frame_idx, image_path in frames:
        if frame_idx not in annos:
            continue
        im = cv2.imread(image_path)
        avg_chans = np.mean(im, axis=(0, 1))
        for track_id, bbox in annos[frame_idx].items():
            x = crop_like_siamfc(im, bbox, search_size=search_size,
                                 padding=avg_chans)
            cv2.imwrite(join(out_dir, f"{frame_idx:06d}.{track_id}.x.jpg"), x)
            if masks and frame_idx in masks and track_id in masks[frame_idx]:
                m = masks[frame_idx][track_id].astype(np.float32)
                xm = (crop_like_siamfc(m, bbox, search_size=search_size) > 0.5)
                cv2.imwrite(join(out_dir, f"{frame_idx:06d}.{track_id}.m.png"),
                            xm.astype(np.uint8) * 255)
