"""Training losses: anchor-sampled cross-entropy, weighted L1, per-cell mask
logistic loss with IoU metrics.

Reference semantics (`models/siammask.py:124-183` base / `siammask_sharp.py:125-187`
sharp):

- cls: NLL over the 2-way log-softmax, averaged separately over positive and
  negative anchors (labels -1 are ignored), combined 0.5/0.5.
- loc: per-anchor L1 summed over the 4 coords, weighted by ``loc_weight``
  (1/num_pos on positive anchors), summed, divided by batch.
- mask: soft-margin (logistic) loss between per-cell predicted masks and unfolded
  ground-truth windows (g_sz x g_sz, stride 8; padding 32 for the base 255-search /
  padding 0 for sharp), over cells with a positive anchor only. The base path
  bilinearly upsamples each selected 63x63 prediction to 127x127 (align_corners).

JAX re-design: the reference gathers dynamic positive index sets; we keep shapes
static either by masked reductions (cls/loc — free) or by a fixed-size top-k gather
of positive cells (mask — bounded at 16 positives/sample by the target sampler).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from siammask_tpu.ops.resize import upsample_bilinear_align_corners


def select_cross_entropy_loss(pred_cls: jax.Array, label_cls: jax.Array) -> jax.Array:
    """pred_cls: NHWC (B, S, S, 2k) raw logits with channels blocked (2, k);
    label_cls: (B, k, S, S) in {-1 ignore, 0 neg, 1 pos}."""
    b, s1, s2, ck = pred_cls.shape
    k = ck // 2
    logits = pred_cls.reshape(b, s1, s2, 2, k)
    logits = jnp.transpose(logits, (0, 4, 1, 2, 3))        # (B, k, S, S, 2)
    logp = jax.nn.log_softmax(logits, axis=-1)

    pos = (label_cls == 1).astype(jnp.float32)
    neg = (label_cls == 0).astype(jnp.float32)
    npos = jnp.sum(pos)
    nneg = jnp.sum(neg)
    loss_pos = -jnp.sum(logp[..., 1] * pos) / jnp.maximum(npos, 1.0)
    loss_neg = -jnp.sum(logp[..., 0] * neg) / jnp.maximum(nneg, 1.0)
    return 0.5 * loss_pos + 0.5 * loss_neg


def weight_l1_loss(pred_loc: jax.Array, label_loc: jax.Array,
                   loss_weight: jax.Array) -> jax.Array:
    """pred_loc: NHWC (B, S, S, 4k) with channels blocked (4, k);
    label_loc: (B, 4, k, S, S); loss_weight: (B, k, S, S)."""
    b, s1, s2, ck = pred_loc.shape
    k = ck // 4
    pred = jnp.transpose(pred_loc.reshape(b, s1, s2, 4, k), (0, 3, 4, 1, 2))
    diff = jnp.sum(jnp.abs(pred - label_loc), axis=1)      # (B, k, S, S)
    return jnp.sum(diff * loss_weight) / b


class MaskLossOut(NamedTuple):
    loss: jax.Array
    iou_mean: jax.Array
    iou_at_5: jax.Array
    iou_at_7: jax.Array
    # positives beyond the static gather capacity (0 when the cap is derived
    # from the batch, since the target sampler bounds positives at 16/sample);
    # surfaced as a train metric so a silent undersample is visible.
    pos_overflow: jax.Array | float = 0.0

# per-sample positive-cell cap enforced by the anchor target sampler
# (data/anchor_target.py AnchorTargetConfig.positive == reference
# anchortarget_layer's 16-positive cap) — sizes the static gather.
POS_PER_SAMPLE = 16


def _soft_margin(x, y):
    # log(1 + exp(-y*x)), numerically stable
    return jax.nn.softplus(-y * x)


def _iou_rows(pred_bin: jax.Array, label: jax.Array):
    """Per-row mask IoU (models/siammask.py:177-183): pred>=0 vs label==1."""
    p = pred_bin >= 0
    l = label == 1
    inter = jnp.sum(p & l, axis=-1).astype(jnp.float32)
    union = jnp.sum(p | l, axis=-1).astype(jnp.float32)
    return inter / jnp.maximum(union, 1.0)


def select_mask_logistic_loss(p_m: jax.Array, mask: jax.Array, weight: jax.Array,
                              o_sz: int = 63, g_sz: int = 127, padding: int = 32,
                              max_pos: int | None = None) -> MaskLossOut:
    """p_m: either (B, S, S, o_sz^2) raw mask-head output (base path — upsampled
    per cell to g_sz), or (B*L, g_sz*g_sz) refined logits (sharp path).
    mask: (B, H, W) ground truth in {-1, +1}; weight: (B, S', S') positive-cell
    indicator (S' matches the unfold grid).

    ``max_pos`` bounds the static gather of positive cells. The reference
    (`models/siammask.py:163-174`) selects EVERY positive cell dynamically; the
    default (None) matches that exactly by scaling the static gather with the
    batch — POS_PER_SAMPLE(16) x B — since the anchor target sampler caps
    positives at 16/sample, so overflow is impossible in real training. Pass an
    explicit cap only for memory-bounded experimentation; ``pos_overflow``
    reports any silently dropped positives.
    """
    w_flat = weight.reshape(-1)
    n_rows = w_flat.shape[0]
    if max_pos is None:
        max_pos = POS_PER_SAMPLE * weight.shape[0]
    k_sel = min(max_pos, n_rows)
    sel_w, sel_idx = jax.lax.top_k(w_flat, k_sel)
    valid = sel_w == 1
    nval = jnp.sum(valid.astype(jnp.float32))
    overflow = jnp.sum((w_flat == 1).astype(jnp.float32)) - nval

    # Ground-truth windows for the selected cells, gathered DIRECTLY from the
    # padded mask. The reference materializes every cell's window first
    # (F.unfold, a memory op) and index-selects after; lowering that unfold to
    # conv_general_dilated_patches turns it into an identity-kernel dense
    # convolution — profiled at 20.8 TFLOP (87% of the whole train step's
    # FLOPs) and 2.6 GB at the reference's batch-64/255^2 layout. Gathering
    # only the <=16*B selected windows is numerically identical (unselected
    # rows never reach the loss) and pure data movement.
    sgrid = weight.shape[1]
    assert (mask.shape[1] + 2 * padding - g_sz) // 8 + 1 == sgrid, (
        "unfold grid does not match the positive-cell weight grid")
    pad_m = jnp.pad(mask, ((0, 0), (padding, padding), (padding, padding)))
    l_cells = sgrid * sgrid
    bi = sel_idx // l_cells
    cell = sel_idx % l_cells

    # Window-extraction lowering history: a single advanced-indexing gather
    # for all K windows measured 273 ms/step (XLA:TPU lowers multi-dim index
    # arrays to near-scalar gathers); a vmapped dynamic_slice lowers to a
    # SERIAL while loop over all K windows — profiled at 4.7 ms/step of the
    # 45.9 ms stage-1 step (one 127-row slice + update per loop iteration,
    # ~60x off memory speed-of-light). What stays: one flat row gather
    # (contiguous 127-row runs, the gather shape TPUs execute well) + a
    # one-hot matmul for the column windows — each output column is exactly
    # one input column, so the MXU contraction is bit-exact and costs
    # ~10 GFLOP at K=1024, noise next to the serial loop it replaces.
    hp_ = mask.shape[1] + 2 * padding
    wp_ = mask.shape[2] + 2 * padding
    ys = cell // sgrid
    xs = cell % sgrid
    rows_flat = pad_m.reshape(-1, wp_)                       # (B*Hp, Wp)
    ridx = (bi * hp_ + 8 * ys)[:, None] + jnp.arange(g_sz)[None, :]
    slab = jnp.take(rows_flat, ridx.reshape(-1),
                    axis=0).reshape(k_sel, g_sz, wp_)        # (K, g, Wp)
    cols = (8 * xs)[:, None] + jnp.arange(g_sz)[None, :]     # (K, g)
    onehot = (cols[:, :, None] ==
              jnp.arange(wp_)[None, None, :]).astype(pad_m.dtype)
    gt_sel = jnp.einsum("krw,kcw->krc", slab, onehot,
                        preferred_element_type=pad_m.dtype
                        ).reshape(-1, g_sz * g_sz)

    if p_m.ndim == 4:
        b, s1, s2, _ = p_m.shape
        # Gather rows while the cell axis stays minor-flat, and only split it
        # into (o_sz, o_sz) AFTER the gather: splitting the 3969-wide minor
        # dim of the full (B*S*S, 3969) tensor is a real relayout of the
        # whole mask-head output (318 MB bf16 at batch 64 — profiled at 5 ms
        # forward + 4 ms of backward scatter/reduce per step, 18% of the
        # stage-1 step); on the K<=16*B gathered rows it is noise.
        #
        # Round 5: gather through THREE index axes instead of pre-flattening
        # (b, s1, s2) — the flat reshape itself forced XLA to relayout the
        # NHWC conv output from its native C-minor/N-second layout to
        # row-major before the take, a 317 MB copy + its backward twin
        # (trace: copy.219 1.1 ms + reshape.2033/2039 3.1 ms per b64 step,
        # ~10% of the frozen phase). The 3-axis gather reads rows in place:
        # same elements, no relayout (measured 47.0 -> 43.1 ms/step frozen,
        # 1361.7 -> 1484.1 samples/s, 35.0 -> 38.1% MFU).
        pred_sel = p_m[bi, cell // s2, cell % s2]
        pred_sel = pred_sel.reshape(-1, o_sz, o_sz, 1)
        pred_sel = upsample_bilinear_align_corners(pred_sel, (g_sz, g_sz))
        pred_sel = pred_sel.reshape(-1, g_sz * g_sz)
    else:
        pred_sel = jnp.take(p_m, sel_idx, axis=0)

    per_row = jnp.mean(_soft_margin(pred_sel, gt_sel), axis=-1)
    loss = jnp.sum(per_row * valid) / jnp.maximum(nval, 1.0)

    iou = _iou_rows(pred_sel, gt_sel)
    iou_mean = jnp.sum(iou * valid) / jnp.maximum(nval, 1.0)
    iou5 = jnp.sum((iou > 0.5) * valid) / jnp.maximum(nval, 1.0)
    iou7 = jnp.sum((iou > 0.7) * valid) / jnp.maximum(nval, 1.0)
    return MaskLossOut(loss, iou_mean, iou5, iou7, overflow)
