"""Benchmark test entry point (VOT + VOS), mirroring the reference tools/test.py CLI.

Usage:
    python tools/test.py --config experiments/siammask_sharp/config_vot.json \
        --resume checkpoint.pth --mask --refine --dataset VOT2018 --data-dir data
"""
import argparse
import sys
from os.path import dirname, realpath

sys.path.insert(0, dirname(dirname(realpath(__file__))))

import numpy as np


def build_model(arch: str, anchor_num: int = 5, xcorr_impl: str = "shift",
                dtype: str = "float32"):
    """Inference defaults to the shift-accumulate xcorr lowering — at tracking
    batch sizes it is ~3x faster than im2col on TPU (latency/bandwidth bound;
    see ops/xcorr.py depthwise_xcorr_shift). Training also defaults to shift
    (tools/train.py --xcorr): at batch 64 the im2col matmul is a per-batch-
    element matvec (N=1) the MXU runs at 1.5 TFLOP/s — 1.8x whole-step win.

    ``dtype`` selects the compute dtype (params stay fp32): 'float32' is the
    metrics default; 'bfloat16' is the throughput mode the bench headlines
    (its metric delta is pinned in PARITY_METRICS.md)."""
    import jax.numpy as jnp

    from siammask_tpu.models.siammask import SiamMaskBase, SiamMaskSharp, SiamRPN

    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    if arch in ("Custom", "SiamMaskSharp"):
        return SiamMaskSharp(anchor_num=anchor_num, xcorr_impl=xcorr_impl,
                             dtype=dt)
    if arch == "SiamMaskBase":
        return SiamMaskBase(anchor_num=anchor_num, xcorr_impl=xcorr_impl,
                            dtype=dt)
    if arch in ("SiamRPN",):
        return SiamRPN(anchor_num=anchor_num, xcorr_impl=xcorr_impl, dtype=dt)
    raise ValueError(f"unknown arch {arch!r}")


def load_variables(model, resume: str | None):
    import jax
    import jax.numpy as jnp

    if resume:
        if resume.endswith(".pth"):
            from siammask_tpu.utils.torch_convert import load_torch_checkpoint
            return load_torch_checkpoint(resume)
        from siammask_tpu.train.checkpoint import load_checkpoint
        return load_checkpoint(resume)["variables"]
    # random init (smoke runs)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)),
                      jnp.zeros((1, 255, 255, 3)))


def main():
    parser = argparse.ArgumentParser(description="Test SiamMask-TPU")
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--arch", default="Custom")
    parser.add_argument("--mask", action="store_true")
    parser.add_argument("--refine", action="store_true")
    parser.add_argument("--dataset", default="VOT2018")
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--video", default="", help="run one video only")
    parser.add_argument("--video-shard", default="",
                        help="'i/n': process only videos with index %% n == i "
                             "(shard a benchmark across hosts/processes; result "
                             "dirs merge exactly as the reference's per-GPU "
                             "fan-out, experiments/*/test_all.sh)")
    parser.add_argument("--save_mask", action="store_true")
    parser.add_argument("--no-batch", action="store_true",
                        help="disable the batched multi-object VOS path")
    parser.add_argument("--scan-chunk", type=int, default=32,
                        help="frames per whole-video lax.scan window in the "
                             "batched VOS path (bounds device frame memory; "
                             "ragged tails step per-frame)")
    parser.add_argument("--result-dir", default="test")
    parser.add_argument("--tracker-name", default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force the JAX backend (the reference's --cpu flag "
                             "analogue; overrides any sitecustomize pin)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="model compute dtype (params stay fp32). float32 "
                             "is the metrics default; bfloat16 trades a "
                             "measured metric delta (PARITY_METRICS.md) for "
                             "the bench's headline throughput")
    args = parser.parse_args()

    if args.platform:
        from siammask_tpu.parallel.mesh import force_platform
        force_platform(args.platform)

    from siammask_tpu.config import Config
    from siammask_tpu.eval.datasets import load_dataset
    from siammask_tpu.tracker.runtime import TrackerRuntime
    from siammask_tpu.tracker.vos import track_vos, track_vos_batched
    from siammask_tpu.tracker.vot import track_vot

    cfg = Config.load(args.config)
    model = build_model(cfg.arch, cfg.anchors.anchor_num, dtype=args.dtype)
    variables = load_variables(model, args.resume)
    p = cfg.tracker_config()

    tracker_name = args.tracker_name or (
        cfg.arch + "_" + ("mask_" if args.mask else "")
        + ("refine_" if args.refine else "")
        + (args.resume.split("/")[-1].split(".")[0] if args.resume else "random"))

    dataset = load_dataset(args.dataset, args.data_dir)
    if args.video:
        dataset = {args.video: dataset[args.video]}
    if args.video_shard:
        i, n = map(int, args.video_shard.split("/"))
        dataset = {name: v for idx, (name, v) in enumerate(sorted(dataset.items()))
                   if idx % n == i}

    runtime = TrackerRuntime(model, variables, p, mask=args.mask,
                             refine=args.refine)

    vos_enable = args.dataset.startswith("DAVIS") or args.dataset == "ytb_vos"
    total_lost = 0
    ious = []
    speeds = []
    for v_id, video in enumerate(dataset.values(), 1):
        if vos_enable:
            kw = {} if args.no_batch else {"scan_chunk": args.scan_chunk}
            vos_fn = track_vos if args.no_batch else track_vos_batched
            iou, fps = vos_fn(
                runtime, video,
                mot_enable=args.dataset in ("DAVIS2017", "ytb_vos"),
                result_dir=args.result_dir, dataset=args.dataset,
                tracker_name=tracker_name, save_mask=args.save_mask, **kw)
            if len(iou) > 0:
                ious.append(np.mean(iou))
            speeds.append(fps)
        else:
            lost, fps = track_vot(runtime, video, dataset=args.dataset,
                                  mask_enable=args.mask,
                                  result_dir=args.result_dir,
                                  tracker_name=tracker_name)
            total_lost += lost
            speeds.append(fps)

    if vos_enable:
        print(f"Mean IoU: {np.mean(ious):.4f}  Mean speed: {np.mean(speeds):.1f}fps")
    else:
        print(f"Total lost: {total_lost}  Mean speed: {np.mean(speeds):.1f}fps")


if __name__ == "__main__":
    main()
