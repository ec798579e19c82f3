"""Tracker-step layout lab: measure scan-step variants on the real chip.

The round-3 step trace (471 us) shows ~80 us/step of pure layout copies; the
two largest are (a) the per-frame relayout of the u8 frame sliced from the
scan's stacked video input (9.4 us + a 4.7 us full-frame convert behind it)
and (b) the relayout feeding the s2d-packed stem conv (13.6 us). Neither is
addressable from op choice alone — they are XLA layout-assignment decisions —
so this lab pins layouts explicitly (`jax.experimental.layout`) and measures:

  baseline     the shipping `Tracker.track_video` scan
  vid:<perm>   same program with the stacked video constrained to the given
               major->minor layout inside the jit (one up-front relayout
               outside the loop instead of one per frame, if XLA obliges)
  donate       retest buffer donation of the carried state (the axon relay
               rejected aliased buffers in round 2 - INVALID_ARGUMENT on the
               first donated step; if the restriction lifted, donation saves
               the state round-trip copies)

Timing follows the honest recipe from CLAUDE.md: compile+warmup barrier and
final sync are host DATA FETCHES; reps chain state so the end fetch is
transitive. One variant at a time; each is a fresh XLA program (cold remote
compile, minutes) — budget accordingly: `--variants baseline,vid:0231`.
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


def build_tracker(fp32: bool = False):
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
    return Tracker(model, p, mask=True, refine=True), variables


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


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--variants", default="donate,baseline,vid:0231",
                    help="comma list: baseline | donate | vid:<majorToMinor "
                         "digits for the (T,H,W,C) video, e.g. vid:0231>")
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    tracker = variables = state = frames = None
    for v in args.variants.split(","):
        v = v.strip()
        if v == "donate":
            print(f"[lab] {probe_donation()}", flush=True)
            continue
        if tracker is None:
            tracker, variables = build_tracker(args.fp32)
            rng = np.random.RandomState(0)
            frame = jnp.asarray(rng.uniform(0, 255, (480, 854, 3)), jnp.uint8)
            state = tracker.init(variables, frame,
                                 np.array([427.0, 240.0]),
                                 np.array([120.0, 160.0]))
            frames = jnp.broadcast_to(frame, (args.scan,) + frame.shape)
        perm = None if v == "baseline" else tuple(int(c) for c in
                                                  v.split(":")[1])
        run = (tracker.track_video if v == "baseline"
               else scan_variant(tracker, perm))
        us = time_variant(run, variables, state, frames, args.iters)
        print(f"[lab] {v:<12s} {us:8.1f} us/frame", flush=True)


if __name__ == "__main__":
    main()
