"""Benchmark: SiamMask-sharp tracking throughput on one TPU chip.

Default mode times the whole-video ``lax.scan`` path — the production serving
layout (frames stacked on device, ONE compiled program, zero per-frame host
dispatch) — so the reported number measures the chip, not the relay RTT of
per-step dispatch (round-1 BENCH swung 320-726 FPS with tunnel noise on the
identical program; the scan metric is dispatch-insensitive). Compute runs in
bfloat16 (the MXU-native dtype; params stay fp32), matching how the framework
is meant to be deployed. ``--per-step`` restores the round-1 host-driven
single-frame metric, ``--fp32`` the fp32 compute path.

The step does the same work the reference counts in its 56 FPS mask+refine
number (README.md:141,145, RTX 2080): sub-window crop + backbone + heads +
decode/penalty/argmax + refine + warp-back on a DAVIS-sized frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
attribution extras: "device_step_us" (per-frame device time) and, when XLA
cost analysis is available, "mfu_pct" (analytic model FLOPs / chip peak).
"""
import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 56.0  # reference SiamMask (mask+refine) on RTX 2080

# bf16 peak matmul throughput per chip, by generation (MFU denominator; fp32
# runs are still measured against the bf16 peak — an upper-bound denominator,
# so MFU is conservative).
PEAK_FLOPS = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}


def _flops_per_frame(jitted, args, n_frames):
    """Analytic per-frame FLOPs from XLA's cost model; None when the backend
    doesn't expose it. The pre-compile Lowered analysis is preferred — it runs
    client-side on the HLO, so it works even when compilation happens on a
    remote service."""
    try:
        lowered = jitted.lower(*args)
    except Exception:
        return None
    for get in (lowered.cost_analysis,
                lambda: lowered.compile().cost_analysis()):
        try:
            cost = get()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost["flops"])
            if flops > 0:
                return flops / n_frames
        except Exception:
            continue
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of the timed loop here")
    parser.add_argument("--iters", type=int, default=128)
    parser.add_argument("--fp32", action="store_true",
                        help="fp32 compute (default bfloat16, params fp32)")
    parser.add_argument("--xcorr", default="mm", choices=["mm", "conv", "pallas"],
                        help="depthwise-xcorr lowering (ops/xcorr.py)")
    parser.add_argument("--scan", type=int, default=64,
                        help="frames per lax.scan window in the default "
                             "whole-video mode")
    parser.add_argument("--per-step", action="store_true",
                        help="host-driven per-frame stepping (dispatch-bound; "
                             "the round-1 metric)")
    parser.add_argument("--streams", type=int, default=1,
                        help="N independent tracking streams stepped as one "
                             "batched program (serving throughput mode); "
                             "reports aggregate frames/s")
    args = parser.parse_args()
    from siammask_tpu.config import TrackerConfig
    from siammask_tpu.models.siammask import SiamMaskSharp
    from siammask_tpu.tracker.tracker import Tracker

    hp = {"instance_size": 255, "out_size": 127, "base_size": 8,
          "seg_thr": 0.35, "penalty_k": 0.04, "window_influence": 0.4, "lr": 1.0}
    p = TrackerConfig().update(hp)

    model = SiamMaskSharp(dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
                          xcorr_impl=args.xcorr)
    rng = np.random.RandomState(0)
    z = jnp.zeros((1, 127, 127, 3), jnp.float32)
    x = jnp.zeros((1, 255, 255, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, x)

    tracker = Tracker(model, p, mask=True, refine=True)

    im_h, im_w = 480, 854  # DAVIS frame geometry
    frame = jnp.asarray(rng.uniform(0, 255, (im_h, im_w, 3)), jnp.float32)

    extras = {}
    peak = PEAK_FLOPS.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"))

    if not args.per_step and args.streams == 1:
        # ---- default: whole-video scan (dispatch-insensitive device metric)
        t_frames = args.scan
        state = tracker.init(variables, frame,
                             np.array([427.0, 240.0]), np.array([120.0, 160.0]))
        frames = jnp.broadcast_to(frame, (t_frames,) + frame.shape)
        _, out = tracker.track_video(variables, state, frames)  # compile
        jax.block_until_ready(out.mask_in_frame)
        reps = max(1, args.iters // t_frames)
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.perf_counter()
        st = state
        for _ in range(reps):
            st, out = tracker.track_video(variables, st, frames)
        jax.block_until_ready(out.mask_in_frame)
        dt = time.perf_counter() - t0
        if args.profile_dir:
            jax.profiler.stop_trace()
        n = reps * t_frames
        fps = n / dt
        extras["device_step_us"] = round(dt / n * 1e6, 1)
        # _scan_jit is a jitted METHOD (self is static argnum 0): .lower must
        # be reached through the class attribute with self passed explicitly
        fpf = _flops_per_frame(type(tracker)._scan_jit,
                               (tracker, variables, state, frames), t_frames)
        if fpf and peak:
            extras["model_gflops_per_frame"] = round(fpf / 1e9, 3)
            extras["mfu_pct"] = round(100.0 * fpf * fps / peak, 3)
        metric = f"siammask_sharp_scan_fps_T{t_frames}"
    else:
        # ---- host-driven stepping (per-frame dispatch; serving-streams mode)
        if args.streams > 1:
            n_st = args.streams
            pos = rng.uniform(100, 400, (n_st, 2)).astype(np.float32)
            sz = rng.uniform(60, 200, (n_st, 2)).astype(np.float32)
            state = tracker.init_batched(variables, frame, pos, sz)
            step = lambda st: tracker.step_batched(variables, st, frame)
        else:
            state = tracker.init(variables, frame,
                                 np.array([427.0, 240.0]),
                                 np.array([120.0, 160.0]))
            step = lambda st: tracker.step(variables, st, frame)

        state2, out = step(state)  # warmup / compile
        jax.block_until_ready(out.mask_in_frame)

        iters = args.iters
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.perf_counter()
        st = state
        for _ in range(iters):
            st, out = step(st)
        jax.block_until_ready(out.mask_in_frame)
        dt = time.perf_counter() - t0
        if args.profile_dir:
            jax.profiler.stop_trace()
        fps = iters * args.streams / dt
        extras["device_step_us"] = round(dt / (iters * args.streams) * 1e6, 1)
        metric = ("siammask_sharp_track_step_fps_per_chip"
                  if args.streams == 1 else
                  f"siammask_sharp_track_aggregate_fps_{args.streams}streams")

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        **extras,
    }))


if __name__ == "__main__":
    main()
