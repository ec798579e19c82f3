"""Training engine: pjit data-parallel step, per-module LR groups, progressive
backbone unfreeze, grad clipping, NaN guard.

Re-designs `tools/train_siammask.py` / `train_siamrpn.py` / `train_siammask_refine.py`
for TPU:

- The train step is one jitted program over a data mesh; batch sharded on axis 0,
  params replicated — XLA inserts the psum gradient all-reduce (the DataParallel
  replacement, SURVEY §2.10).
- Optimizer: SGD momentum 0.9 + weight decay 1e-4 in torch's formulation
  (g + wd*w fed to the momentum buffer), per-group LR multipliers via
  ``optax.multi_transform`` labels — backbone resnet x0.1 (custom.py:43-56),
  neck / rpn / mask / refine at their config multipliers, frozen groups zeroed.
- Progressive unfreeze (`features.unfix`, models/features.py:45-57): epoch
  fraction >= 0.5 unlocks layer2+layer3; crossing the boundary rebuilds the
  optimizer (fresh momentum) and re-jits with train-mode BN for those stages —
  the analogue of `train_siammask.py:208-210`.
- Loss = w_cls*cls + w_loc*loc + w_mask*mask (`train_siammask.py:241-243`);
  skip-step guard on non-finite/huge loss (`:180-181,255`); global-norm grad clip
  (`:248-253`).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from siammask_tpu.models.losses import (select_cross_entropy_loss,
                                        select_mask_logistic_loss,
                                        weight_l1_loss)
from siammask_tpu.parallel.mesh import batch_sharding, replicated


# ---------------------------------------------------------------------------
# parameter grouping


def label_params(params: dict, unfreeze_backbone: bool, train_refine_only: bool = False):
    """Assign each param leaf an optimizer-group label.

    Groups: 'resnet' (backbone conv stages, x0.1 LR), 'neck', 'rpn', 'mask',
    'refine', 'frozen'. The stem+layer1 are always frozen; layer2/3 follow the
    unfreeze schedule. ``train_refine_only`` freezes everything but mask+refine
    (stage-2 refine training)."""

    def label_for(path: tuple) -> str:
        top = path[0]
        if train_refine_only:
            if top in ("mask_corr",):
                return "mask"
            if top == "refine":
                return "refine"
            return "frozen"
        if top == "backbone":
            stage = path[1]
            if stage in ("conv1", "bn1", "layer1"):
                return "frozen"
            return "resnet" if unfreeze_backbone else "frozen"
        if top == "neck":
            return "neck"
        if top == "rpn":
            return "rpn"
        if top == "mask_corr":
            return "mask"
        if top == "refine":
            return "refine"
        raise KeyError(f"unknown param subtree {path}")

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return label_for(path)

    return walk(params)


@dataclass
class OptimizerConfig:
    momentum: float = 0.9
    weight_decay: float = 1e-4
    clip: float = 10.0
    # per-module clip split (reference train_siammask.py:248-253 /
    # config_helper.py:62-70): when clip_split, features (backbone+neck), rpn
    # and mask+refine are clipped by their own global norms instead of one
    # whole-model norm.
    clip_split: bool = False
    clip_feature: float = 10.0
    clip_rpn: float = 10.0
    clip_mask: float = 10.0
    feature_lr_mult: float = 1.0
    rpn_lr_mult: float = 1.0
    mask_lr_mult: float = 1.0

    @classmethod
    def from_lr_cfg(cls, lr_cfg: dict, clip: float = 10.0,
                    clip_cfg: dict | None = None) -> "OptimizerConfig":
        clip_cfg = clip_cfg or {}
        feature = clip_cfg.get("feature") or clip
        return cls(feature_lr_mult=lr_cfg.get("feature_lr_mult", 1.0),
                   rpn_lr_mult=lr_cfg.get("rpn_lr_mult", 1.0),
                   mask_lr_mult=lr_cfg.get("mask_lr_mult", 1.0),
                   # unsplit mode uses the feature value as THE global clip
                   # (config_helper.py:69-70 writes it back into args.clip)
                   clip=feature,
                   clip_split=bool(clip_cfg.get("split", False)),
                   clip_feature=feature,
                   clip_rpn=clip_cfg.get("rpn") or clip,
                   clip_mask=clip_cfg.get("mask") or feature)


def build_optimizer(params: dict, cfg: OptimizerConfig, unfreeze_backbone: bool,
                    train_refine_only: bool = False):
    """Build the optax transform + labels. LR itself is injected per step (the
    epoch schedule array indexes it), so transforms only apply group multipliers."""
    mults = {
        "resnet": 0.1 * cfg.feature_lr_mult,
        "neck": 1.0 * cfg.feature_lr_mult,
        "rpn": cfg.rpn_lr_mult,
        "mask": cfg.mask_lr_mult,
        "refine": cfg.mask_lr_mult,
    }

    def group_transform(mult):
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=cfg.momentum, nesterov=False),
            optax.scale(mult),
        )

    transforms = {name: group_transform(m) for name, m in mults.items()}
    transforms["frozen"] = optax.set_to_zero()
    labels = label_params(params, unfreeze_backbone, train_refine_only)

    if cfg.clip_split:
        # Per-module norms, matching the reference's three clip_grad_norm_
        # calls: features == backbone+neck as ONE joint norm, rpn, mask+refine.
        clip_groups = {"resnet": "feature", "neck": "feature", "rpn": "rpn",
                       "mask": "mask", "refine": "mask", "frozen": "frozen"}
        clip_labels = jax.tree.map(lambda l: clip_groups[l], labels)
        clip_tx = optax.multi_transform(
            {"feature": optax.clip_by_global_norm(cfg.clip_feature),
             "rpn": optax.clip_by_global_norm(cfg.clip_rpn),
             "mask": optax.clip_by_global_norm(cfg.clip_mask),
             "frozen": optax.identity()},
            clip_labels)
    else:
        clip_tx = optax.clip_by_global_norm(cfg.clip)
    tx = optax.chain(clip_tx, optax.multi_transform(transforms, labels))
    return tx, labels


# ---------------------------------------------------------------------------
# train step


@dataclass
class TrainSettings:
    task: str = "sharp"             # 'siamrpn' | 'base' | 'sharp' | 'sharp_refine'
    loss_weight: tuple = (1.0, 1.0, 36.0)
    o_sz: int = 63
    g_sz: int = 127
    mask_pad: int = 32              # 32 for base-255 search, 0 for sharp-143
    # None: size the static positive-cell gather to 16 x batch (covers every
    # positive the target sampler can emit — full reference semantics)
    max_pos: int | None = None


def make_train_step(model, settings: TrainSettings, tx, mesh=None,
                    unfreeze_backbone: bool = False,
                    fused_allreduce: bool = False,
                    sync_bn: bool = False,
                    remat: bool = False,
                    donate: bool = False) -> Callable:
    """Returns jitted step(variables, opt_state, batch, lr) ->
    (variables, opt_state, metrics).

    ``fused_allreduce`` switches the data-parallel gradient exchange from
    XLA-auto-inserted per-tensor psums (exact global reductions; the default) to
    an explicit shard_map with ALL gradients flattened into one bucket and a
    single pmean — one collective per step instead of one per parameter tensor
    (gradient bucketing, the production scale-out layout). By default BN
    normalizes over the LOCAL shard batch (DDP semantics; running stats pmean'd
    across the mesh) — losses/grads agree with the auto-psum path to ~1% at
    small per-shard batch and converge as local batch grows. ``sync_bn``
    instead syncs BN batch statistics across the mesh inside the shard_map
    (flax axis_name -> pmean per BN), exactly matching global-batch BN at the
    cost of two small collectives per training-mode BN layer.

    ``remat`` rematerializes the forward during the backward instead of
    keeping activations in HBM (jax.checkpoint with nothing_saveable — in a
    convnet a dots policy saves every layer) — trades ~1/3 more FLOPs for the
    activation memory of the 255^2-search backbone, buying larger per-chip
    batch. Numerically exact.

    ``donate`` donates the ``variables`` and ``opt_state`` buffers (their HBM
    is reused for the outputs — halves optimizer-update memory traffic
    headroom). The passed-in pytrees are DELETED by the call; only enable when
    the caller threads the returned ones exclusively, as the training CLI
    does."""
    w_cls, w_loc, w_mask = settings.loss_weight
    train_layers = (unfreeze_backbone, unfreeze_backbone)

    def _stop_frozen(params):
        """stop_gradient on frozen params: the reference's optimizer excludes
        them entirely (rpn.py:23-29), so their gradients are never consumed —
        stopping them lets XLA dead-code-eliminate the frozen-stage backward
        (most of the bwd FLOPs when the backbone is frozen) and the matching
        gradient all-reduces."""
        labels = label_params(params, unfreeze_backbone,
                              train_refine_only=settings.task == "sharp_refine")
        return jax.tree.map(
            lambda p, l: jax.lax.stop_gradient(p) if l == "frozen" else p,
            params, labels)

    def loss_fn(params, batch_stats, batch, model=model):
        params = _stop_frozen(params)
        variables = {"params": params, "batch_stats": batch_stats}
        if settings.task == "siamrpn":
            (score, loc), new_model_state = model.apply(
                variables, batch["template"], batch["search"],
                train_layers=train_layers, method="forward_train",
                mutable=["batch_stats"])
            pred_mask = None
        elif settings.task == "base":
            out, new_model_state = model.apply(
                variables, batch["template"], batch["search"],
                train_layers=train_layers, method="forward_train",
                mutable=["batch_stats"])
            score, loc, pred_mask = out.score, out.loc, out.mask
        else:  # sharp / sharp_refine
            refine_only = settings.task == "sharp_refine"
            (score, loc, pred_mask), new_model_state = model.apply(
                variables, batch["template"], batch["search"],
                train_layers=(False, False) if refine_only else train_layers,
                train_backbone_neck=not refine_only,
                train_rpn=not refine_only,
                method="forward_train", mutable=["batch_stats"])

        cls_loss = select_cross_entropy_loss(score, batch["label_cls"])
        loc_loss = weight_l1_loss(loc, batch["label_loc"],
                                  batch["label_loc_weight"])
        metrics = {"cls_loss": cls_loss, "loc_loss": loc_loss}
        total = w_cls * cls_loss + w_loc * loc_loss
        if pred_mask is not None:
            m = select_mask_logistic_loss(
                pred_mask, batch["label_mask"], batch["label_mask_weight"],
                o_sz=settings.o_sz, g_sz=settings.g_sz,
                padding=settings.mask_pad, max_pos=settings.max_pos)
            total = total + w_mask * m.loss
            metrics.update(mask_loss=m.loss, iou_mean=m.iou_mean,
                           iou_at_5=m.iou_at_5, iou_at_7=m.iou_at_7,
                           mask_pos_overflow=m.pos_overflow)
        metrics["total_loss"] = total
        return total, (new_model_state["batch_stats"], metrics)

    # full remat (nothing saved): in a convnet every layer is a "dot", so a
    # dots-saveable policy keeps all activations anyway — measured on chip it
    # RAISED peak memory (rematted clones defeat XLA's buffer reuse) and
    # OOMed where the plain step fit. nothing_saveable actually trades FLOPs
    # for memory here.
    grad_loss = jax.checkpoint(
        loss_fn, policy=jax.checkpoint_policies.nothing_saveable,
    ) if remat else loss_fn

    def step(variables, opt_state, batch, lr):
        params = variables["params"]
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            grad_loss, has_aux=True)(params, variables["batch_stats"], batch)

        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(params, updates)

        # NaN/huge-loss guard (train_siammask.py:180-181,255): skip the whole
        # update, including BN running stats, when the loss is sick.
        ok = jnp.isfinite(loss) & (jnp.abs(loss) <= 1e4)
        pick = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        new_params = pick(new_params, params)
        new_opt_state = pick(new_opt_state, opt_state)
        new_stats = pick(new_stats, variables["batch_stats"])
        metrics["skipped"] = (~ok).astype(jnp.float32)

        return ({"params": new_params, "batch_stats": new_stats},
                new_opt_state, metrics)

    def step_fused(variables, opt_state, batch, lr):
        """Gradient-bucketed dp step: shard_map over 'data', one fused pmean."""
        try:
            from jax import shard_map
        except ImportError:  # jax < 0.6
            from jax.experimental.shard_map import shard_map
        from jax.flatten_util import ravel_pytree
        from jax.sharding import PartitionSpec as P

        params = variables["params"]
        _, unravel = ravel_pytree(params)
        # sync-BN: the flax modules pmean their batch stats over 'data' —
        # only meaningful (and only valid) inside the shard_map
        shard_model = model.clone(bn_axis="data") if sync_bn else model

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), P("data")),
                 out_specs=(P(), P(), P()))
        def grads_shard(params, stats, local_batch):
            shard_loss = lambda p, s, b: loss_fn(p, s, b, model=shard_model)
            if remat:
                shard_loss = jax.checkpoint(
                    shard_loss,
                    policy=jax.checkpoint_policies.nothing_saveable)
            (loss, (new_stats, metrics)), grads = jax.value_and_grad(
                shard_loss, has_aux=True)(params, stats, local_batch)
            flat = ravel_pytree(grads)[0]
            flat = jax.lax.pmean(flat, "data")          # the ONE collective
            new_stats = jax.tree.map(lambda x: jax.lax.pmean(x, "data"),
                                     new_stats)
            metrics = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), metrics)
            return flat, new_stats, metrics

        flat_grads, new_stats, metrics = grads_shard(
            params, variables["batch_stats"], batch)
        grads = unravel(flat_grads)

        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(params, updates)

        loss = metrics["total_loss"]
        ok = jnp.isfinite(loss) & (jnp.abs(loss) <= 1e4)
        pick = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        new_params = pick(new_params, params)
        new_opt_state = pick(new_opt_state, opt_state)
        new_stats = pick(new_stats, variables["batch_stats"])
        metrics["skipped"] = (~ok).astype(jnp.float32)
        return ({"params": new_params, "batch_stats": new_stats},
                new_opt_state, metrics)

    if mesh is not None:
        bspec = batch_sharding(mesh)
        rspec = replicated(mesh)
        return jax.jit(step_fused if fused_allreduce else step,
                       in_shardings=(rspec, rspec, bspec, rspec),
                       out_shardings=(rspec, rspec, rspec),
                       donate_argnums=(0, 1) if donate else ())
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


# ---------------------------------------------------------------------------
# high-level loop helper


class Trainer:
    """Epoch-driven loop: owns optimizer rebuilds at unfreeze boundaries, LR
    schedule indexing, and checkpoint policy. IO-free — callers drive it with
    batches (see tools/train.py)."""

    def __init__(self, model, variables, settings: TrainSettings,
                 opt_cfg: OptimizerConfig, lr_spaces: np.ndarray,
                 epochs: int, mesh=None, unfreeze_at: float = 0.5,
                 fused_allreduce: bool = False, sync_bn: bool = False,
                 remat: bool = False, donate: bool = False):
        self.model = model
        self.variables = variables
        self.settings = settings
        self.opt_cfg = opt_cfg
        self.lr_spaces = lr_spaces
        self.epochs = epochs
        self.mesh = mesh
        self.unfreeze_at = unfreeze_at
        self.fused_allreduce = fused_allreduce and mesh is not None
        self.sync_bn = sync_bn
        self.remat = remat
        self.donate = donate
        self._unfrozen = None
        self._step_fn = None
        self.opt_state = None
        self._ensure_phase(0)

    def _ensure_phase(self, epoch: int):
        refine_only = self.settings.task == "sharp_refine"
        unfrozen = (not refine_only) and (epoch / self.epochs >= self.unfreeze_at)
        if unfrozen == self._unfrozen:
            return
        self._unfrozen = unfrozen
        tx, _ = build_optimizer(self.variables["params"], self.opt_cfg,
                                unfreeze_backbone=unfrozen,
                                train_refine_only=refine_only)
        self._tx = tx
        self.opt_state = tx.init(self.variables["params"])
        self._step_fn = make_train_step(self.model, self.settings, tx,
                                        mesh=self.mesh,
                                        unfreeze_backbone=unfrozen,
                                        fused_allreduce=self.fused_allreduce,
                                        sync_bn=self.sync_bn,
                                        remat=self.remat,
                                        donate=self.donate)

    def restore(self, path: str) -> int:
        """Full-fidelity resume (reference utils/load_helper.py:57-70 restores
        model + optimizer + epoch): variables, then align the optimizer tree
        with the checkpoint's unfreeze phase BEFORE restoring momentum —
        _ensure_phase re-inits opt_state when the phase flips, so the restore
        must come after. Returns the epoch to resume from."""
        import logging

        from flax import serialization

        from siammask_tpu.train.checkpoint import load_checkpoint

        ck = load_checkpoint(path)
        self.variables = ck["variables"]
        start_epoch = ck["epoch"]
        self._ensure_phase(min(start_epoch, self.epochs - 1))
        if "opt_state_raw" in ck:
            log = logging.getLogger(__name__)
            try:
                restored = serialization.from_state_dict(
                    self.opt_state, ck["opt_state_raw"])
                # from_state_dict does NOT raise when a multi_transform group
                # flips between frozen/unfrozen across the unfreeze boundary —
                # it silently grafts the old phase's MaskedNode placeholders
                # ({}) where the new phase expects momentum arrays, which then
                # crashes inside the first update. Accept the restore only if
                # the tree structure matches the current phase's optimizer.
                if (jax.tree_util.tree_structure(restored)
                        == jax.tree_util.tree_structure(self.opt_state)):
                    self.opt_state = restored
                else:
                    # the boundary rebuild discards momentum anyway (fresh
                    # state, as the reference's unfreeze rebuild does)
                    log.warning("optimizer state not restored: checkpoint is "
                                "from the other unfreeze phase; momentum "
                                "restarts (matches the boundary rebuild)")
            except (ValueError, KeyError) as e:
                log.warning(f"optimizer state not restored: {e}")
        return start_epoch

    def step(self, batch: dict, epoch: int):
        self._ensure_phase(epoch)
        lr = jnp.float32(self.lr_spaces[min(epoch, len(self.lr_spaces) - 1)])
        self.variables, self.opt_state, metrics = self._step_fn(
            self.variables, self.opt_state, batch, lr)
        return metrics
