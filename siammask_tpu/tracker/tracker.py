"""Functional tracker: the TPU-native re-design of `siamese_init`/`siamese_track`
(tools/test.py:132-315).

The reference's per-frame loop round-trips device->host for anchor decode, penalty,
argmax, and mask warp-back (all numpy/cv2). Here the ENTIRE step — sub-window crop,
backbone+heads, anchor decode, scale/ratio penalty, cosine-window argmax, state
update, refine at the best cell, sigmoid, warp-back to frame coordinates,
thresholding — is one jitted device program. The only host work per frame is image
decode and (for VOT) contour extraction from the returned binary mask.

State is an explicit pytree (`TrackState`) so a whole video is
``lax.scan(step, state, frames)`` and multi-object VOS is ``vmap`` over states.

Numerics reproduce the reference exactly: context-scaled crop sizes with banker's
rounding, the anchor decode/penalty formulas (test.py:209-237), EMA size update
(test.py:239-249), the sub-box/back-box warp geometry (test.py:276-282), and state
clamping (test.py:305-308).
"""
from __future__ import annotations

from functools import cached_property, partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from siammask_tpu.config import TrackerConfig
from siammask_tpu.ops.sample import subwindow_crop, warp_back_mask
from siammask_tpu.tracker.anchors import generate_score_map_anchors


class TrackState(NamedTuple):
    target_pos: jax.Array   # (2,) center x, y in frame coords
    target_sz: jax.Array    # (2,) w, h in frame coords
    zf: jax.Array           # (1, 7, 7, 256) template features
    avg_chans: jax.Array    # (3,) frame channel means (pad fill)
    score: jax.Array        # () best score of the last step


class StepOutput(NamedTuple):
    target_pos: jax.Array   # (2,) updated center (clamped)
    target_sz: jax.Array    # (2,) updated size (clamped)
    score: jax.Array        # () best penalized raw score
    best_id: jax.Array      # () flat argmax over (k, S, S)
    mask_in_frame: jax.Array | None   # (im_h, im_w) soft mask in frame coords
    mask_logits: jax.Array | None     # (out_sz, out_sz) raw sigmoid mask in cell coords


def make_window(p: TrackerConfig) -> np.ndarray:
    s = p.score_size
    if p.windowing == "cosine":
        w = np.outer(np.hanning(s), np.hanning(s))
    else:
        w = np.ones((s, s))
    return np.tile(w.flatten(), p.anchor_num).astype(np.float32)


def _context_size(target_sz, context_amount):
    wc = target_sz[0] + context_amount * jnp.sum(target_sz)
    hc = target_sz[1] + context_amount * jnp.sum(target_sz)
    return jnp.sqrt(wc * hc)


def _flatten_anchor_major(x, k):
    """(1, S, S, C*k) -> (C, k*S*S) with channels blocked as C groups of k."""
    _, s1, s2, ck = x.shape
    c = ck // k
    x = x.reshape(s1, s2, c, k)
    return jnp.transpose(x, (2, 3, 0, 1)).reshape(c, k * s1 * s2)


class Tracker:
    """Compiled tracker for one model + config + frame geometry.

    ``mask``/``refine`` select the SiamRPN / SiamMask-base / SiamMask-sharp paths
    (mirroring test.py's --mask/--refine flags). Frame height/width are static per
    video (one compile per resolution; XLA caches)."""

    def __init__(self, model, p: TrackerConfig, mask: bool = True,
                 refine: bool = True, latency_lowerings: bool = True,
                 sample_impl: str = "auto", crop_packed: bool | None = None,
                 multi_sample_impl: str = "auto",
                 multi_crop_packed: bool | None = None):
        self.model = model
        # Latency-optimized clone for the batch-1 single-stream paths: the
        # Refine tail's thin convs switch to the VPU shift lowering (wins only
        # at batch 1 — see heads.Conv3x3) and the backbone stem to the
        # space-to-depth lowering (resnet.SpaceToDepthStem: -70us/frame at
        # batch 1; ~neutral-to-slightly-negative at batch 64, so training and
        # batched serving keep the direct conv). Batched paths (vmap hides
        # the stream count from the module) and training keep the MXU
        # defaults. Same parameter tree, so `variables` are interchangeable.
        #
        # ``latency_lowerings=False`` keeps the reference lowerings on the
        # single-stream paths too. The clone lowerings compute the same maps
        # (phase maxpool bit-exact; s2d stem / shift convs to f32 rounding —
        # pinned in tests/test_stem_s2d.py, tests/test_ops.py), but in a
        # CLOSED LOOP over razor-edge random weights ~1-ULP reduction-order
        # differences compound into divergent reset decisions, so the
        # implementation-parity harnesses (tools/{metric_parity,
        # parity_report}.py) opt out to compare algorithms, not lowerings;
        # the deployment-lowering metric delta is measured separately
        # (PARITY_METRICS.md bf16 section).
        if not latency_lowerings:
            self.model_single = model
        else:
            try:
                self.model_single = model.clone(thin_conv_threshold=128,
                                                stem_s2d=True,
                                                maxpool_phase=True)
            except TypeError:  # no Refine decoder (base / siamrpn)
                self.model_single = model.clone(stem_s2d=True,
                                                maxpool_phase=True)
        # Sampling lowerings (ops/sample.py): 'gather' is the f32-exact
        # reference path; 'mm' lowers crop + mask warp-back as MXU
        # contractions (bf16 weights, f32 accumulation — a deployment-mode
        # lowering, error ~1 uint8 intensity unit). crop_packed emits the
        # search crop pre-packed in the s2d stem's block-2 layout, skipping
        # the stem's phase-split movement — requires the corresponding model
        # to run stem_s2d. The single-stream and batched paths are knobbed
        # separately because their winners differ (chip, round 5):
        #   batch-1 scan   468.2 us baseline | mm 431.0 | packed 471.0 |
        #                  mm+packed 431.2   -> mm, packed off
        #   16-stream      379.4 us/stream   | mm 338.9 | packed 600.4 |
        #                  mm+packed 327.0   -> mm+packed (3058 aggregate fps)
        # 'auto' enables the winners only in DEPLOYMENT mode — bf16 compute —
        # so fp32 parity/eval paths keep the exact gather sampler, exactly
        # like the thin-conv/s2d clones.
        deploy = getattr(model, "dtype", None) == jnp.bfloat16
        if sample_impl == "auto":
            sample_impl = "mm" if deploy and latency_lowerings else "gather"
        if multi_sample_impl == "auto":
            # latency_lowerings=False is the parity opt-out and must gate the
            # batched path too, or Tracker(bf16, latency_lowerings=False)
            # silently compares deployment lowerings instead of algorithms
            multi_sample_impl = ("mm" if deploy and latency_lowerings
                                 else "gather")
        if crop_packed is None:
            crop_packed = False          # neutral at batch 1 (431.2 vs 431.0)
        if multi_crop_packed is None:
            multi_crop_packed = deploy and latency_lowerings
        self._impl_single = sample_impl
        self._packed_single = crop_packed and latency_lowerings
        self._impl_multi = multi_sample_impl
        self._packed_multi = multi_crop_packed
        self.model_multi = (model.clone(stem_s2d=True)
                            if multi_crop_packed else model)
        self.p = p
        self.mask_enable = mask
        self.refine_enable = refine
        self.anchor = jnp.asarray(generate_score_map_anchors(p.anchor_config(),
                                                             p.score_size))
        self.window = jnp.asarray(make_window(p))
        self._init_jit = jax.jit(self._init_impl)
        # NOTE: donate_argnums=(1,) on the carried state would save ~0.1ms of
        # state round-trip copies per frame on the host-driven per-step path.
        # Round 2: the axon relay rejected aliased buffers (INVALID_ARGUMENT).
        # Round 4 re-probe (tools/scan_lab.py --variants donate): ACCEPTED —
        # but the headline scan path already aliases its carry inside the
        # compiled loop (donation only affects program inputs, once per
        # 64-frame dispatch), and on the per-step path the ~0.1 ms sits far
        # below the tunnel RTT while making every held state reference a
        # use-after-donate hazard for external drivers. Kept copy-in/copy-out.
        self._step_jit = jax.jit(self._step_impl)

    # ---------------- init ----------------

    def _init_impl(self, variables, frame, target_pos, target_sz):
        p = self.p
        # frames may arrive as uint8 (4x cheaper host->device than fp32 over
        # PCIe or a network transport); all math runs in f32 regardless —
        # the crop casts after its first gather (ops/sample.py), and
        # jnp.mean upcasts integer inputs, so no full-frame f32 copy is made
        avg_chans = jnp.mean(frame, axis=(0, 1), dtype=jnp.float32)
        s_z = jnp.round(_context_size(target_sz, p.context_amount))
        z_crop = subwindow_crop(frame, target_pos, s_z, p.exemplar_size, avg_chans)
        zf = self.model.apply(variables, z_crop[None], method="template")
        return TrackState(target_pos=target_pos.astype(jnp.float32),
                          target_sz=target_sz.astype(jnp.float32),
                          zf=zf, avg_chans=avg_chans,
                          score=jnp.zeros((), jnp.float32))

    def init(self, variables, frame, target_pos, target_sz) -> TrackState:
        """frame: (H, W, 3) float32; target_pos/target_sz: (2,) arrays."""
        return self._init_jit(variables, frame,
                              jnp.asarray(target_pos, jnp.float32),
                              jnp.asarray(target_sz, jnp.float32))

    # ---------------- step ----------------

    def _step_impl(self, variables, state: TrackState, frame):
        """Batch-1 step (latency clone of the model)."""
        return self._step_body(self.model_single, variables, state, frame,
                               self._impl_single, self._packed_single)

    def _step_impl_multi(self, variables, state: TrackState, frame):
        """Step as vmapped under a stream/object axis (MXU-default model)."""
        return self._step_body(self.model_multi, variables, state, frame,
                               self._impl_multi, self._packed_multi)

    def _step_body(self, model, variables, state: TrackState, frame,
                   impl: str = "gather", packed: bool = False):
        p = self.p
        # uint8 frames pass through to the crop unconverted (see init)
        k = p.anchor_num
        s = p.score_size
        im_h, im_w = frame.shape[0], frame.shape[1]
        target_pos, target_sz = state.target_pos, state.target_sz

        # search-region geometry (test.py:180-187)
        s_x = _context_size(target_sz, p.context_amount)
        scale_x = p.exemplar_size / s_x
        pad = (p.instance_size - p.exemplar_size) / 2 / scale_x
        s_x_full = jnp.round(s_x + 2 * pad)
        crop_xy = target_pos - s_x_full / 2

        # cols-first gather measured faster than rows-first on the frame crop
        # (470.9 vs 476.2 us device step) — the frame relayout it provokes is
        # cheaper than the wider rows-first intermediate
        x_crop = subwindow_crop(frame, target_pos, s_x_full, p.instance_size,
                                state.avg_chans, impl=impl,
                                packed=packed)[None]

        if self.mask_enable:
            out = model.apply(variables, state.zf, x_crop, method="track_mask")
            score_map, loc_map = out.score, out.loc
        else:
            score_map, loc_map = model.apply(variables, state.zf, x_crop,
                                             method="track")
            out = None

        # decode (test.py:205-212); channels blocked (2,k) / (4,k)
        logits = _flatten_anchor_major(score_map, k)     # (2, kSS)
        score = jax.nn.sigmoid(logits[1] - logits[0])    # 2-way softmax prob of fg
        delta = _flatten_anchor_major(loc_map, k)        # (4, kSS)

        dx = delta[0] * self.anchor[:, 2] + self.anchor[:, 0]
        dy = delta[1] * self.anchor[:, 3] + self.anchor[:, 1]
        # clip the log-scale deltas: exp overflows fp32 past 88, and one inf
        # candidate poisons the whole step (inf*0=NaN in the lr blend, and a
        # NaN pscore cell wins argmax). |delta|<=20 (scale factor e^20~5e8) is
        # exact identity for any real box, so trained-weight trajectories are
        # bit-identical; only untrained/exploding weights are affected.
        dw = jnp.exp(jnp.clip(delta[2], -20.0, 20.0)) * self.anchor[:, 2]
        dh = jnp.exp(jnp.clip(delta[3], -20.0, 20.0)) * self.anchor[:, 3]

        def change(r):
            return jnp.maximum(r, 1.0 / r)

        def ssz(w, h):
            pad_ = (w + h) * 0.5
            return jnp.sqrt((w + pad_) * (h + pad_))

        target_in_crop = target_sz * scale_x
        s_c = change(ssz(dw, dh) / ssz(target_in_crop[0], target_in_crop[1]))
        r_c = change((target_in_crop[0] / target_in_crop[1]) / (dw / dh))
        penalty = jnp.exp(-(r_c * s_c - 1) * p.penalty_k)
        pscore = penalty * score * (1 - p.window_influence) \
            + self.window * p.window_influence
        best = jnp.argmax(pscore)

        # state update (test.py:239-249)
        lr = penalty[best] * score[best] * p.lr
        new_pos = target_pos + jnp.stack([dx[best], dy[best]]) / scale_x
        pred_wh = jnp.stack([dw[best], dh[best]]) / scale_x
        new_sz = target_sz * (1 - lr) + pred_wh * lr

        mask_in_frame = None
        mask_cell = None
        if self.mask_enable:
            # unravel best -> (anchor, row, col)
            cell = best % (s * s)
            delta_y = cell // s
            delta_x = cell % s

            if self.refine_enable:
                logits_m = model.apply(
                    variables, out.skips, out.corr,
                    jnp.stack([delta_y, delta_x]).astype(jnp.int32),
                    method="track_refine")          # (1, 127*127)
                mask_cell = jax.nn.sigmoid(
                    logits_m.reshape(p.out_size, p.out_size))
            else:
                mvec = jax.lax.dynamic_slice(
                    out.mask, (0, delta_y, delta_x, 0),
                    (1, 1, 1, out.mask.shape[3]))
                mask_cell = jax.nn.sigmoid(
                    mvec.reshape(p.out_size, p.out_size))

            # warp back to frame coords (test.py:276-282)
            sc = s_x_full / p.instance_size
            sub_x = crop_xy[0] + (delta_x - p.base_size / 2) * p.total_stride * sc
            sub_y = crop_xy[1] + (delta_y - p.base_size / 2) * p.total_stride * sc
            sub_w = sc * p.exemplar_size
            s2 = p.out_size / sub_w
            back_box = jnp.stack([-sub_x * s2, -sub_y * s2, im_w * s2, im_h * s2])
            mask_in_frame = warp_back_mask(mask_cell, back_box, (im_h, im_w),
                                           impl=impl)

        # clamp into frame (test.py:305-308)
        new_pos = jnp.clip(new_pos, jnp.zeros(2),
                           jnp.array([im_w, im_h], jnp.float32))
        new_sz = jnp.clip(new_sz, jnp.full(2, 10.0),
                          jnp.array([im_w, im_h], jnp.float32))

        # fp32 regardless of model dtype: a bf16 score in the carried state
        # would change the step signature vs init's fp32 and force a retrace +
        # recompile inside the tracking loop
        best_score = score[best].astype(jnp.float32)
        new_state = state._replace(target_pos=new_pos, target_sz=new_sz,
                                   score=best_score)
        return new_state, StepOutput(new_pos, new_sz, best_score, best,
                                     mask_in_frame, mask_cell)

    def step(self, variables, state: TrackState, frame):
        return self._step_jit(variables, state, frame)

    # ---------------- batched multi-object (VOS) ----------------

    @cached_property
    def _init_vmap(self):
        return jax.jit(jax.vmap(self._init_impl, in_axes=(None, None, 0, 0)))

    @cached_property
    def _step_vmap(self):
        return jax.jit(jax.vmap(self._step_impl_multi, in_axes=(None, 0, None)))

    def init_batched(self, variables, frame, target_pos, target_sz) -> TrackState:
        """Init O independent object trackers on one frame: target_pos/target_sz
        are (O, 2); returns a TrackState with leading object axis. The batched
        template pass shares one backbone program across objects."""
        return self._init_vmap(variables, frame,
                               jnp.asarray(target_pos, jnp.float32),
                               jnp.asarray(target_sz, jnp.float32))

    def step_batched(self, variables, states: TrackState, frame):
        """One frame for O objects at once — the batched-xcorr multi-template
        configuration: backbone/heads run with batch=O on the MXU instead of O
        sequential passes (the reference tracks objects sequentially,
        tools/test.py:481-504)."""
        return self._step_vmap(variables, states, frame)

    # ---------------- whole-video scan ----------------

    @partial(jax.jit, static_argnums=(0,))
    def _scan_jit(self, variables, state, frames):
        def body(st, frame):
            st, out = self._step_impl(variables, st, frame)
            return st, out

        return jax.lax.scan(body, state, frames)

    def track_video(self, variables, state: TrackState, frames):
        """frames: (T, H, W, 3) stacked on device. Returns (final_state, outputs)
        where outputs are stacked StepOutputs — zero host round-trips per frame."""
        return self._scan_jit(variables, state, frames)

    @partial(jax.jit, static_argnums=(0,))
    def _scan_multi_jit(self, variables, states, frames):
        step = jax.vmap(self._step_impl_multi, in_axes=(None, 0, None))

        def body(st, frame):
            st, out = step(variables, st, frame)
            return st, out

        return jax.lax.scan(body, states, frames)

    def track_video_multi(self, variables, states: TrackState, frames):
        """Whole-video multi-object segmentation as ONE device program:
        ``lax.scan`` over frames of the object-vmapped step. states carries a
        leading object axis (from init_batched); outputs stack as (T, O, ...).
        This is the production path for DAVIS-style eval — every frame runs all
        templates through one batched backbone/xcorr pass, and the host only
        sees the final stacked masks."""
        return self._scan_multi_jit(variables, states, frames)
