"""Training entry point (SiamRPN / SiamMask-base / SiamMask-sharp refine stage).

Mirrors the reference `tools/train_siammask.py` / `train_siamrpn.py` /
`train_siammask_refine.py` CLIs: config-driven datasets/LR/loss weights,
epoch-indexed schedule, per-epoch checkpoints, progressive unfreeze.

Usage:
    python tools/train.py --config experiments/siammask_base/config.json \
        --task base --epochs 20 --batch 64 --save-dir snapshot
"""
import argparse
import logging
import sys
import time
from os.path import dirname, join, realpath

sys.path.insert(0, dirname(dirname(realpath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Train SiamMask-TPU")
    parser.add_argument("--config", required=True)
    parser.add_argument("--task", default="base",
                        choices=["siamrpn", "base", "sharp", "sharp_refine"])
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--xcorr", default="shift",
                        choices=["mm", "conv", "shift", "pallas"],
                        help="depthwise-xcorr lowering; 'shift' (25 VPU "
                             "shift-FMAs) measured 1.8x faster whole-step "
                             "than the im2col 'mm' path at batch 64 (the "
                             "5x5-kernel im2col matmul has N=1 per batch "
                             "element - MXU-hostile)")
    parser.add_argument("--workers-mode", default="thread",
                        choices=["thread", "process"],
                        help="loader item-worker pool: threads (cv2 releases "
                             "the GIL; right for few-core hosts) or forked "
                             "processes (the reference's torch num_workers="
                             "16..20 analogue for many-core TPU-VM hosts)")
    parser.add_argument("--clip", type=float, default=10.0)
    parser.add_argument("--width", type=int, default=None,
                        help="reduced backbone base width (64 = real model); "
                             "keeps the exact module tree at a compile/compute "
                             "budget — CPU smoke runs and dryruns")
    parser.add_argument("--save-dir", default="snapshot")
    parser.add_argument("--pretrained", default=None,
                        help="checkpoint to warm-start from (.pth or .msgpack)")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--log-interval", type=int, default=10)
    parser.add_argument("--seed", type=int, default=None,
                        help="deterministic data-pipeline seed: each item's "
                             "sampling/augmentation stream becomes a pure "
                             "function of (seed, epoch, index), independent "
                             "of loader worker count/mode (reference parity: "
                             "torch's DataLoader seeds workers from its "
                             "generator; ours is per-item, so it also holds "
                             "across num_workers changes)")
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force the JAX backend (overrides any sitecustomize"
                             " pin); cpu + --num-devices N gives N virtual "
                             "devices for mesh validation without chips")
    parser.add_argument("--unfreeze-at", type=float, default=0.5,
                        help="training-progress fraction at which backbone "
                             "layer2/3 unfreeze (reference change_point 0.5, "
                             "experiments/siammask_sharp/custom.py:39)")
    parser.add_argument("--fused-allreduce", action="store_true",
                        help="bucket all gradients into one pmean per step "
                             "(shard_map DP with local-BN, DDP-style) instead "
                             "of XLA auto-inserted per-tensor collectives")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize the forward in the backward "
                             "(jax.checkpoint full remat) — trades "
                             "~1/3 more FLOPs for activation memory, allowing "
                             "larger per-chip batch")
    parser.add_argument("--sync-bn", action="store_true",
                        help="with --fused-allreduce: sync BN batch stats "
                             "across the mesh (exact global-batch BN at the "
                             "cost of 2 small collectives per BN layer)")
    parser.add_argument("--tb-dir", default=None,
                        help="TensorBoard log dir (loss/cls, loss/loc, loss/mask, "
                             "mask IoU metrics, lr — as the reference logs)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("train")

    import jax
    import jax.numpy as jnp

    if args.platform:
        from siammask_tpu.parallel.mesh import force_platform
        if not force_platform(args.platform, args.num_devices):
            log.warning("backend already initialized; --platform ignored")

    # env capture (the reference logs get_pretty_env_info at startup)
    log.info(f"jax {jax.__version__} backend {jax.default_backend()} "
             f"devices {jax.devices()} process {jax.process_index()}")

    from siammask_tpu.config import Config
    from siammask_tpu.data.dataset import DataLoader, PairDataset
    from siammask_tpu.models.siammask import SiamMaskBase, SiamMaskSharp, SiamRPN
    from siammask_tpu.data.dataset import prefetch_to_device
    from siammask_tpu.parallel.mesh import data_parallel_mesh
    from siammask_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from siammask_tpu.train.lr import build_lr_spaces
    from siammask_tpu.train.trainer import (OptimizerConfig, Trainer,
                                            TrainSettings)
    from siammask_tpu.utils.torch_convert import load_torch_checkpoint

    cfg = Config.load(args.config, clip=args.clip)

    model_cls = {"siamrpn": SiamRPN, "base": SiamMaskBase,
                 "sharp": SiamMaskSharp, "sharp_refine": SiamMaskSharp}[args.task]
    model_kw = {"width": args.width} if args.width else {}
    model = model_cls(anchor_num=cfg.anchors.anchor_num, xcorr_impl=args.xcorr,
                      **model_kw)

    train_cfg = cfg.train_datasets
    search = train_cfg.get("search_size", 255)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, search, search, 3)))
    if args.pretrained:
        if args.pretrained.endswith(".pth"):
            loaded = load_torch_checkpoint(args.pretrained)
        else:
            loaded = load_checkpoint(args.pretrained)["variables"]
        # non-strict overlay (reference load_pretrain, load_helper.py:30-54):
        # the two-stage flow warm-starts sharp_refine from a stage-1 base
        # checkpoint that has no refine params — those keep their fresh init
        from siammask_tpu.train.checkpoint import merge_variables
        variables, missing, unused = merge_variables(variables, loaded)
        if missing:
            log.info(f"pretrained: {len(missing)} param path(s) kept at init "
                     f"(e.g. {missing[0]})")
        if unused:
            log.info(f"pretrained: {len(unused)} checkpoint path(s) unused "
                     f"(e.g. {unused[0]})")

    dataset = PairDataset(train_cfg, cfg.anchors, num_epoch=1, seed=args.seed)
    loader = DataLoader(dataset, args.batch, num_workers=args.workers,
                        workers_mode=args.workers_mode)
    num_per_epoch = len(loader)

    mesh = data_parallel_mesh(args.num_devices) if jax.device_count() > 1 else None

    settings = TrainSettings(
        task=args.task, loss_weight=cfg.loss_weight,
        o_sz=63, g_sz=127,
        mask_pad=0 if search < 255 else 32)
    lr_spaces = build_lr_spaces(cfg.lr, args.epochs)
    trainer = Trainer(model, variables, settings,
                      OptimizerConfig.from_lr_cfg(cfg.lr, clip=args.clip,
                                                  clip_cfg=cfg.clip),
                      lr_spaces, epochs=args.epochs, mesh=mesh,
                      unfreeze_at=args.unfreeze_at,
                      fused_allreduce=args.fused_allreduce,
                      sync_bn=args.sync_bn, remat=args.remat,
                      donate=True)  # the CLI threads trainer state exclusively

    start_epoch = 0
    if args.resume:
        # full-fidelity resume: variables + optimizer momentum + epoch
        # (reference utils/load_helper.py:57-70 via restore_from)
        start_epoch = trainer.restore(args.resume)

    tb = None
    if args.tb_dir:
        from tensorboardX import SummaryWriter
        tb = SummaryWriter(args.tb_dir)

    step = start_epoch * num_per_epoch
    t_last = time.time()
    for epoch in range(start_epoch, args.epochs):
        dataset.shuffle()
        # device prefetch (pin_memory analogue): a background thread stages
        # the next batches onto the device/mesh while the step runs
        for batch in prefetch_to_device(iter(loader), size=2, mesh=mesh):
            metrics = trainer.step(batch, epoch)
            step += 1
            if step % args.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                if tb is not None:
                    tb.add_scalar("loss/cls", m.get("cls_loss", 0), step)
                    tb.add_scalar("loss/loc", m.get("loc_loss", 0), step)
                    tb.add_scalar("loss/mask", m.get("mask_loss", 0), step)
                    tb.add_scalar("mask/mIoU", m.get("iou_mean", 0), step)
                    tb.add_scalar("mask/AP@.5", m.get("iou_at_5", 0), step)
                    tb.add_scalar("mask/AP@.7", m.get("iou_at_7", 0), step)
                    tb.add_scalar("lr", float(lr_spaces[epoch]), step)
                    # per-group effective LRs (reference train_siammask.py:221
                    # logs lr/group%d for each optimizer param group)
                    oc = trainer.opt_cfg
                    mults = {"resnet": 0.1 * oc.feature_lr_mult,
                             "neck": oc.feature_lr_mult,
                             "rpn": oc.rpn_lr_mult,
                             "mask": oc.mask_lr_mult,
                             "refine": oc.mask_lr_mult}
                    for g, (name, mult) in enumerate(sorted(mults.items())):
                        tb.add_scalar(f"lr/group{g}_{name}",
                                      float(lr_spaces[epoch]) * mult, step)
                dt = (time.time() - t_last) / args.log_interval
                t_last = time.time()
                log.info(f"epoch {epoch} step {step} "
                         f"lr {lr_spaces[epoch]:.5f} "
                         + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                         + f" ({dt:.2f}s/it)")
        save_checkpoint(join(args.save_dir, f"checkpoint_e{epoch + 1}.msgpack"),
                        trainer.variables, trainer.opt_state, epoch + 1,
                        arch=cfg.arch, anchor_cfg=cfg.anchors.to_dict())
        log.info(f"saved checkpoint_e{epoch + 1}")


if __name__ == "__main__":
    main()
