"""Benchmark: single-stream SiamMask-sharp track-step FPS on one TPU chip.

Measures the fully fused on-device step (sub-window crop + backbone + heads +
decode/penalty/argmax + refine + warp-back to frame coords) on a DAVIS-sized
frame — the same work the reference counts in its 56 FPS mask+refine number
(README.md:141,145, RTX 2080).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 56.0  # reference SiamMask (mask+refine) on RTX 2080


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of the timed loop here")
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (params stay fp32)")
    parser.add_argument("--xcorr", default="mm", choices=["mm", "conv", "pallas"],
                        help="depthwise-xcorr lowering (ops/xcorr.py)")
    parser.add_argument("--scan", type=int, default=0,
                        help="T>0: time the whole-video lax.scan path over T "
                             "stacked frames (zero per-frame host dispatch)")
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

    model = SiamMaskSharp(dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                          xcorr_impl=args.xcorr)
    rng = np.random.RandomState(0)
    z = jnp.zeros((1, 127, 127, 3), jnp.float32)
    x = jnp.zeros((1, 255, 255, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, x)

    tracker = Tracker(model, p, mask=True, refine=True)

    im_h, im_w = 480, 854  # DAVIS frame geometry
    frame = jnp.asarray(rng.uniform(0, 255, (im_h, im_w, 3)), jnp.float32)

    if args.scan > 0:
        state = tracker.init(variables, frame,
                             np.array([427.0, 240.0]), np.array([120.0, 160.0]))
        frames = jnp.broadcast_to(frame, (args.scan,) + frame.shape)
        _, out = tracker.track_video(variables, state, frames)  # compile
        jax.block_until_ready(out.mask_in_frame)
        reps = max(1, args.iters // args.scan)
        t0 = time.perf_counter()
        st = state
        for _ in range(reps):
            st, out = tracker.track_video(variables, st, frames)
        jax.block_until_ready(out.mask_in_frame)
        dt = time.perf_counter() - t0
        fps = reps * args.scan / dt
        print(json.dumps({
            "metric": f"siammask_sharp_scan_fps_T{args.scan}",
            "value": round(fps, 2), "unit": "fps",
            "vs_baseline": round(fps / BASELINE_FPS, 3),
        }))
        return

    if args.streams > 1:
        n = args.streams
        pos = rng.uniform(100, 400, (n, 2)).astype(np.float32)
        sz = rng.uniform(60, 200, (n, 2)).astype(np.float32)
        state = tracker.init_batched(variables, frame, pos, sz)
        step = lambda st: tracker.step_batched(variables, st, frame)
    else:
        state = tracker.init(variables, frame,
                             np.array([427.0, 240.0]), np.array([120.0, 160.0]))
        step = lambda st: tracker.step(variables, st, frame)

    # warmup / compile
    state2, out = step(state)
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

    metric = ("siammask_sharp_track_step_fps_per_chip" if args.streams == 1 else
              f"siammask_sharp_track_aggregate_fps_{args.streams}streams")
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
