"""Host-level tracker runtime: numpy frames in, reference-format state out.

Thin shell around the compiled `Tracker` (tracker.py): feeds frames to the
on-device step and does the only remaining host work — rotated-box extraction
from the binary mask (cv2 contours + minAreaRect, `tools/test.py:284-303`),
which the VOT protocol needs as the reported polygon.
"""
from __future__ import annotations

import cv2
import numpy as np

import jax.numpy as jnp

from siammask_tpu.config import TrackerConfig
from siammask_tpu.tracker.tracker import Tracker, TrackState
from siammask_tpu.utils.bbox import cxy_wh_2_rect


def mask_to_rotated_box(target_mask: np.ndarray, target_pos, target_sz):
    """Largest-contour minAreaRect polygon; falls back to the axis-aligned box
    from the box branch when the mask is empty (test.py:284-303)."""
    # [-2] is the contour list under both the 2- and 3-tuple cv2 APIs
    contours = cv2.findContours(target_mask.astype(np.uint8),
                                cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)[-2]
    cnt_area = [cv2.contourArea(cnt) for cnt in contours]
    if len(contours) != 0 and np.max(cnt_area) > 100:
        contour = contours[int(np.argmax(cnt_area))]
        polygon = contour.reshape(-1, 2)
        return cv2.boxPoints(cv2.minAreaRect(polygon))
    location = cxy_wh_2_rect(target_pos, target_sz)
    return np.array([[location[0], location[1]],
                     [location[0] + location[2], location[1]],
                     [location[0] + location[2], location[1] + location[3]],
                     [location[0], location[1] + location[3]]])


class TrackerRuntime:
    """Stateful convenience wrapper: owns variables + TrackState, mirrors the
    reference's state-dict API (siamese_init/siamese_track)."""

    def __init__(self, model, variables, p: TrackerConfig, mask: bool = True,
                 refine: bool = True, latency_lowerings: bool = True):
        self.tracker = Tracker(model, p, mask=mask, refine=refine,
                               latency_lowerings=latency_lowerings)
        self.variables = variables
        self.p = p
        self.mask_enable = mask
        self.state: TrackState | None = None

    def init(self, im: np.ndarray, target_pos, target_sz):
        # uint8 frames upload as-is (4x cheaper H2D than fp32; the jitted
        # step casts on device)
        frame = jnp.asarray(im)
        self.state = self.tracker.init(self.variables, frame,
                                       np.asarray(target_pos, np.float32),
                                       np.asarray(target_sz, np.float32))
        return self.state

    def track(self, im: np.ndarray, soft_mask: bool = True) -> dict:
        """One frame. ``soft_mask=False`` thresholds the mask ON DEVICE and
        fetches a uint8 binary mask (key "mask_bin") instead of the fp32 soft
        mask — 4x less device->host traffic; right for VOT/demo consumers
        that only need the polygon/overlay (VOS fusion needs the soft mask).
        """
        frame = jnp.asarray(im)
        self.state, out = self.tracker.step(self.variables, self.state, frame)
        result = {
            "target_pos": np.asarray(out.target_pos),
            "target_sz": np.asarray(out.target_sz),
            "score": float(out.score),
        }
        if self.mask_enable:
            if soft_mask:
                mask_in_frame = np.asarray(out.mask_in_frame)
                target_mask = (mask_in_frame > self.p.seg_thr).astype(np.uint8)
                result["mask"] = mask_in_frame
            else:
                if not hasattr(self, "_thresh_jit"):
                    import jax
                    thr = float(self.p.seg_thr)
                    self._thresh_jit = jax.jit(
                        lambda m: (m > thr).astype(jnp.uint8))
                target_mask = np.asarray(self._thresh_jit(out.mask_in_frame))
                result["mask_bin"] = target_mask
            result["polygon"] = mask_to_rotated_box(
                target_mask, result["target_pos"], result["target_sz"])
        return result
