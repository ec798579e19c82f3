"""Tracker-step layout lab: measure scan-step variants on the real chip.

The round-3 step trace (471 us) showed ~80 us/step of pure layout copies; the
largest are (a) the per-frame relayout of the u8 frame sliced from the scan's
stacked video input (9.4 us + a 4.7 us full-frame convert behind it) and
(b) the relayout feeding the s2d-packed stem conv (13.6 us). Round-4 probes
(layout pinning inside jit, buffer donation) showed they are not addressable
from XLA layout knobs. Round 5 attacks them from op choice after all, with
two sampling lowerings (ops/sample.py):

  mm       crop + mask warp-back as MXU weight-matrix contractions instead
           of gathers (bf16 weights, f32 accumulation)
  packed   the search crop emits the s2d stem's block-2 packed layout
           straight from its sampling indices (no phase-split movement)

Variants (comma list, each measured as its own compiled program — cold
remote compiles take minutes; budget accordingly):

  baseline           the shipping `Tracker.track_video` scan
  mm | packed | mmpacked
                     single-stream scan with the lowering(s) above
  s16:baseline | s16:mm | s16:packed | s16:mmpacked
                     16-stream batched serving scan (track_video_multi) —
                     the 45.5%-MFU plateau under attack (README serving
                     section); reports PER-STREAM us (aggregate = /16)
  vid:<perm>         baseline with the stacked video constrained to the
                     given major->minor layout inside the jit
  donate             probe whether the relay accepts donated buffers

Timing follows the honest recipe from CLAUDE.md: compile+warmup barrier and
final sync are host DATA FETCHES; reps chain state so the end fetch is
transitive. One variant at a time.
"""
from __future__ import annotations

import argparse
import time
from os.path import dirname, realpath
import sys

sys.path.insert(0, dirname(dirname(realpath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Layout


def build_tracker(fp32: bool = False, **knobs):
    from siammask_tpu.config import TrackerConfig
    from siammask_tpu.models.siammask import SiamMaskSharp
    from siammask_tpu.tracker.tracker import Tracker

    hp = {"instance_size": 255, "out_size": 127, "base_size": 8,
          "seg_thr": 0.35, "penalty_k": 0.04, "window_influence": 0.4,
          "lr": 1.0}
    p = TrackerConfig().update(hp)
    model = SiamMaskSharp(dtype=jnp.float32 if fp32 else jnp.bfloat16,
                          xcorr_impl="shift")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 127, 127, 3), jnp.float32),
                           jnp.zeros((1, 255, 255, 3), jnp.float32))
    return Tracker(model, p, mask=True, refine=True, **knobs), variables


def scan_variant(tracker, layout_perm: tuple | None):
    """A track_video-equivalent jit, optionally pinning the video layout."""

    @jax.jit
    def run(variables, state, frames):
        if layout_perm is not None:
            from jax.experimental.layout import with_layout_constraint
            frames = with_layout_constraint(
                frames, Layout(major_to_minor=layout_perm))

        def body(st, frame):
            st, out = tracker._step_impl(variables, st, frame)
            return st, out

        return jax.lax.scan(body, state, frames)

    return run


def time_variant(run, variables, state, frames, iters: int) -> float:
    t_frames = frames.shape[0]
    _, out = run(variables, state, frames)
    float(np.asarray(out.score).ravel()[-1])          # compile barrier
    reps = max(1, iters // t_frames)
    t0 = time.perf_counter()
    st = state
    for _ in range(reps):
        st, out = run(variables, st, frames)
    float(np.asarray(out.score).ravel()[-1])          # end-only honest sync
    dt = time.perf_counter() - t0
    return dt / (reps * t_frames) * 1e6               # us/frame


def probe_donation() -> str:
    """Does the backend accept a donated (aliased) carry buffer now?"""
    f = jax.jit(lambda x: x + 1.0, donate_argnums=0)
    x = jnp.ones((256, 256), jnp.float32)
    try:
        y = f(x)
        float(np.asarray(y)[0, 0])
        y = f(y)
        float(np.asarray(y)[0, 0])
        return "donation ACCEPTED"
    except Exception as e:                            # noqa: BLE001
        return f"donation rejected: {type(e).__name__}: {str(e)[:120]}"


# Every knob is PINNED explicitly: Tracker's 'auto'/None defaults resolve to
# the deployment winners (mm, packed-multi) for bf16 models, so an empty dict
# would silently measure mm against itself and a regression in the deployment
# lowering would show a ~0 delta vs "baseline".
_KNOBS = {
    "baseline": dict(sample_impl="gather", crop_packed=False,
                     multi_sample_impl="gather", multi_crop_packed=False),
    "mm": dict(sample_impl="mm", crop_packed=False,
               multi_sample_impl="mm", multi_crop_packed=False),
    "packed": dict(sample_impl="gather", crop_packed=True,
                   multi_sample_impl="gather", multi_crop_packed=True),
    "mmpacked": dict(sample_impl="mm", crop_packed=True,
                     multi_sample_impl="mm", multi_crop_packed=True),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--variants", default="baseline,mm,packed,mmpacked",
                    help="comma list, see module docstring")
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.uniform(0, 255, (480, 854, 3)), jnp.uint8)
    frames = jnp.broadcast_to(frame, (args.scan,) + frame.shape)

    for v in args.variants.split(","):
        v = v.strip()
        if v == "donate":
            print(f"[lab] {probe_donation()}", flush=True)
            continue
        streams = 1
        name = v
        if v.startswith("s16:"):
            streams, name = 16, v[4:]
        if name.startswith("vid:"):
            tracker, variables = build_tracker(args.fp32)
            perm = tuple(int(c) for c in name.split(":")[1])
            run = scan_variant(tracker, perm)
        else:
            tracker, variables = build_tracker(args.fp32, **_KNOBS[name])
            run = (tracker.track_video if streams == 1
                   else tracker.track_video_multi)
        if streams == 1:
            state = tracker.init(variables, frame,
                                 np.array([427.0, 240.0]),
                                 np.array([120.0, 160.0]))
        else:
            pos = rng.uniform(100, 400, (streams, 2)).astype(np.float32)
            sz = rng.uniform(60, 200, (streams, 2)).astype(np.float32)
            state = tracker.init_batched(variables, frame, pos, sz)
        us = time_variant(run, variables, state, frames,
                          args.iters) / streams
        agg = f" ({1e6 / us:7.1f} aggregate fps)" if streams > 1 else ""
        print(f"[lab] {v:<16s} {us:8.1f} us/frame{agg}", flush=True)


if __name__ == "__main__":
    main()
