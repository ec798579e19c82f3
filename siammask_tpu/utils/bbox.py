"""Box geometry helpers (host-side numpy; the on-device anchor decode lives in
tracker/tracker.py's jitted step).

Semantics match the reference `utils/bbox_helper.py` (corner/center conversions at
:14-45, `cxy_wh_2_rect` :48, `get_axis_aligned_bbox` :52-74, `aug_apply` :77-142,
vectorized `IoU` :145-165) — these exact formulas feed the anchor generator, the
training-target builder, and the VOT protocol, so parity matters down to the +1 in
the axis-aligned box size.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Corner(NamedTuple):
    x1: object
    y1: object
    x2: object
    y2: object


class Center(NamedTuple):
    x: object
    y: object
    w: object
    h: object


BBox = Corner


def corner2center(corner):
    """(x1,y1,x2,y2) -> (cx,cy,w,h); accepts Corner or array-like [4, ...]."""
    if isinstance(corner, Corner):
        x1, y1, x2, y2 = corner
        return Center((x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1)
    x1, y1, x2, y2 = corner[0], corner[1], corner[2], corner[3]
    return (x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1


def center2corner(center):
    """(cx,cy,w,h) -> (x1,y1,x2,y2); accepts Center or array-like [4, ...]."""
    if isinstance(center, Center):
        x, y, w, h = center
        return Corner(x - w * 0.5, y - h * 0.5, x + w * 0.5, y + h * 0.5)
    x, y, w, h = center[0], center[1], center[2], center[3]
    return x - w * 0.5, y - h * 0.5, x + w * 0.5, y + h * 0.5


def cxy_wh_2_rect(pos, sz):
    """Center+size -> [x, y, w, h] rect (0-indexed top-left)."""
    return np.array([pos[0] - sz[0] / 2, pos[1] - sz[1] / 2, sz[0], sz[1]])


def rect_2_cxy_wh(rect):
    """[x, y, w, h] rect -> (center, size) arrays."""
    return (np.array([rect[0] + rect[2] / 2, rect[1] + rect[3] / 2]),
            np.array([rect[2], rect[3]]))


def get_axis_aligned_bbox(region):
    """VOT rotated 8-point polygon -> area-preserving axis-aligned (cx,cy,w,h).

    For 8-point input the output size is scaled so the axis box has the same area
    as the rotated box estimate, with the historical +1 on each side.
    """
    region = np.asarray(region)
    if region.size == 8:
        cx = np.mean(region[0::2])
        cy = np.mean(region[1::2])
        x1, x2 = min(region[0::2]), max(region[0::2])
        y1, y2 = min(region[1::2]), max(region[1::2])
        a1 = np.linalg.norm(region[0:2] - region[2:4]) * np.linalg.norm(region[2:4] - region[4:6])
        a2 = (x2 - x1) * (y2 - y1)
        s = np.sqrt(a1 / a2)
        w = s * (x2 - x1) + 1
        h = s * (y2 - y1) + 1
    else:
        x, y, w, h = region[0], region[1], region[2], region[3]
        cx = x + w / 2
        cy = y + h / 2
    return cx, cy, w, h


def aug_apply(bbox, param, shape, inv=False, rd=False):
    """Shift/scale a box within image bounds; invertible.

    Forward: clamps the scale so the box fits the image, clamps the shift so the box
    stays inside, optionally rounds, and returns (new_bbox, real_param) where
    real_param records the effective scale/shift actually applied.
    Inverse: undoes a recorded real_param.
    """
    if not inv:
        center = corner2center(bbox)
        original_center = center

        real_param = {}
        if 'scale' in param:
            scale_x, scale_y = param['scale']
            imh, imw = shape[:2]
            h, w = center.h, center.w
            scale_x = min(scale_x, float(imw) / w)
            scale_y = min(scale_y, float(imh) / h)
            center = Center(center.x, center.y, center.w * scale_x, center.h * scale_y)

        bbox = center2corner(center)

        if 'shift' in param:
            tx, ty = param['shift']
            x1, y1, x2, y2 = bbox
            imh, imw = shape[:2]
            tx = max(-x1, min(imw - 1 - x2, tx))
            ty = max(-y1, min(imh - 1 - y2, ty))
            bbox = Corner(x1 + tx, y1 + ty, x2 + tx, y2 + ty)

        if rd:
            bbox = Corner(*map(round, bbox))

        current_center = corner2center(bbox)
        real_param['scale'] = (current_center.w / original_center.w,
                               current_center.h / original_center.h)
        real_param['shift'] = (current_center.x - original_center.x,
                               current_center.y - original_center.y)
        return bbox, real_param

    scale_x, scale_y = param.get('scale', (1.0, 1.0))
    tx, ty = param.get('shift', (0, 0))
    center = corner2center(bbox)
    center = Center(center.x - tx, center.y - ty, center.w / scale_x, center.h / scale_y)
    return center2corner(center)


def bbox_iou(rect1, rect2):
    """Vectorized IoU over corner boxes given as [4, ...] (or broadcastable)."""
    x1, y1, x2, y2 = rect1[0], rect1[1], rect1[2], rect1[3]
    tx1, ty1, tx2, ty2 = rect2[0], rect2[1], rect2[2], rect2[3]

    xx1 = np.maximum(tx1, x1)
    yy1 = np.maximum(ty1, y1)
    xx2 = np.minimum(tx2, x2)
    yy2 = np.minimum(ty2, y2)

    ww = np.maximum(0, xx2 - xx1)
    hh = np.maximum(0, yy2 - yy1)

    area = (x2 - x1) * (y2 - y1)
    target_a = (tx2 - tx1) * (ty2 - ty1)
    inter = ww * hh
    return inter / (area + target_a - inter)


# Alias kept for readers coming from the reference naming.
IoU = bbox_iou
