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
attribution extras: "device_step_us" (per-frame device time),
"model_gflops_per_frame" (analytic conv/matmul FLOPs from a jaxpr walk —
XLA's cost_analysis is blind to this backend's custom-call convolutions) and
"mfu_pct" (those FLOPs x rate / chip peak).

Timing discipline: all timed loops synchronize through HOST DATA FETCHES at
shallow dispatch-queue depth — `block_until_ready` on the tunnel relay can
ack early, and fetches behind a deep queue degrade ~1000x (see CLAUDE.md);
every number here was cross-checked against jax.profiler device traces.
"""
import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

_T0 = time.monotonic()


def _phase(msg: str):
    """Stderr breadcrumb with elapsed process time — wall-clock attribution
    for the row itself (which phase eats a summary child's budget: tunnel
    probe / compile / measure / FLOP walk). Never on stdout (the driver
    parses stdout for the one JSON line)."""
    import sys
    print(f"bench: {msg} [{time.monotonic() - _T0:.0f}s]", file=sys.stderr,
          flush=True)


BASELINE_FPS = 56.0  # reference SiamMask (mask+refine) on RTX 2080
# reference training: 600k pairs/epoch x 20 epochs in ~10 h on 4x V100
# (reference README.md:174, experiments/siammask_base/{config.json,run.sh})
BASELINE_TRAIN_SPS = 333.0

# bf16 peak matmul throughput per chip, by generation (MFU denominator; fp32
# runs are still measured against the bf16 peak — an upper-bound denominator,
# so MFU is conservative).
PEAK_FLOPS = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}


def _jaxprs_in(value):
    import jax.extend.core  # explicit: `jax.extend` is not auto-imported
    if isinstance(value, jax.extend.core.ClosedJaxpr):
        yield value
    elif isinstance(value, (list, tuple)):
        for v in value:
            yield from _jaxprs_in(v)


def _walk_matmul_flops(jaxpr, mult):
    """Sum conv/dot FLOPs over a jaxpr, recursing into scan/pjit/cond bodies
    (scan bodies multiplied by their trip count, cond by its worst branch)."""
    import numpy as _np
    prod = lambda xs: int(_np.prod(list(xs), dtype=_np.int64)) if xs else 1
    total = 0
    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        if p == "conv_general_dilated":
            out = eqn.outvars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            kspatial = [rhs[i] for i in dn.rhs_spec[2:]]
            cin_per_group = rhs[dn.rhs_spec[1]]
            cout = rhs[dn.rhs_spec[0]]
            fgc = eqn.params.get("feature_group_count", 1)
            if cin_per_group == 1 and cout == fgc * prod(kspatial):
                # conv_general_dilated_patches: an identity-kernel conv used
                # as window extraction (ops/unfold.py, the mask-loss unfold).
                # It is data movement, not math — counting its one-hot matmul
                # would add a fictitious 2.6 TFLOP to the batch-8 train step.
                continue
            total += mult * 2 * prod(out) * prod(kspatial) * cin_per_group
        elif p == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            l = eqn.invars[0].aval.shape
            r = eqn.invars[1].aval.shape
            k = prod(l[i] for i in lc)
            b = prod(l[i] for i in lb)
            m = prod(l[i] for i in range(len(l))
                     if i not in set(lc) | set(lb))
            n = prod(r[i] for i in range(len(r))
                     if i not in set(rc) | set(rb))
            total += mult * 2 * b * m * n * k
        elif p == "cond":
            total += max((_walk_matmul_flops(cj.jaxpr, mult)
                          for cj in _jaxprs_in(eqn.params["branches"])),
                         default=0)
        else:
            m = mult * (eqn.params["length"] if p == "scan" else 1)
            for v in eqn.params.values():
                for cj in _jaxprs_in(v):
                    total += _walk_matmul_flops(cj.jaxpr, m)
    return total


def _flops_per_frame(jitted, args, n_frames):
    """Analytic per-frame matmul/conv FLOPs by walking the traced jaxpr.

    NOT XLA's cost_analysis: backends that lower convolutions to custom-calls
    (the axon TPU plugin among them) report flops only for the residual
    elementwise work — measured ~60x undercount on this conv-dominated model
    (0.53 vs the true 33.8 GFLOP/frame). The jaxpr walk is backend-independent
    and counts the standard MFU numerator (dense conv/matmul FLOPs, 2*MACs);
    scan bodies are multiplied by trip count, a cond contributes its heaviest
    branch, and dead code is NOT eliminated — negligible here since the
    counted primitives all feed outputs."""
    import jax
    try:
        jaxpr = jax.make_jaxpr(lambda: jitted(*args))()
        flops = _walk_matmul_flops(jaxpr.jaxpr, 1)
        return flops / n_frames if flops > 0 else None
    except Exception:
        return None


def _fast_init(model, *inputs):
    """Host-built random variables with the exact tree/shapes/dtypes
    ``model.init`` would produce (via ``jax.eval_shape`` — no device work).

    Un-jitted flax init runs EAGERLY: one tunnel-relay dispatch per op,
    measured at 239 s of a 329 s bench row (vs <1 s building the arrays on
    host and shipping them once). Bench timing is value-independent for this
    dense-conv model; BN scales/running-vars get their canonical 1 and
    biases/means 0 so activation magnitudes stay sane, everything else is
    small-normal."""
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *inputs)
    rng = np.random.RandomState(0)

    def fill(path, sd):
        last = path[-1]
        name = getattr(last, "key", None) or str(last)
        if name in ("scale", "var"):
            arr = np.ones(sd.shape, sd.dtype)
        elif name in ("bias", "mean"):
            arr = np.zeros(sd.shape, sd.dtype)
        else:
            arr = (rng.randn(*sd.shape) * 0.02).astype(sd.dtype)
        return jnp.asarray(arr)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def bench_train(args):
    """Training-step throughput on one chip.

    Stage 1 (--train): SiamMask-base layout — batch of 127-template /
    255-search pairs, full fwd+bwd+clip+SGD — the configuration behind the
    reference's '~10 h on 4x V100' number.

    Stage 2 (--train-refine): SiamMask-sharp refine layout — 143x143 search,
    3x3 score grid, loss weight (0,0,36), optimizer over mask+refine params
    only with backbone+rpn frozen in eval (reference
    tools/train_siammask_refine.py:98-183, experiments/siammask_sharp/
    config.json)."""
    from siammask_tpu.train.trainer import (OptimizerConfig, TrainSettings,
                                            build_optimizer, make_train_step)

    refine = getattr(args, "train_refine", False)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    rng = np.random.RandomState(0)
    if refine:
        from siammask_tpu.models.siammask import SiamMaskSharp
        model = SiamMaskSharp(dtype=dtype, xcorr_impl=args.xcorr or "shift",
                              thin_conv_threshold=args.thin_threshold,
                              packed_conv_threshold=args.packed_threshold)
        search, size = 143, 3
        settings = TrainSettings(task="sharp_refine",
                                 loss_weight=(0.0, 0.0, 36.0), mask_pad=0)
    else:
        from siammask_tpu.models.siammask import SiamMaskBase
        model = SiamMaskBase(dtype=dtype, xcorr_impl=args.xcorr or "shift")
        search, size = 255, 25
        settings = TrainSettings(task="base", loss_weight=(1.0, 1.2, 36.0),
                                 mask_pad=32)
    variables = _fast_init(model, jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, search, search, 3)))

    tx, _ = build_optimizer(variables["params"], OptimizerConfig(),
                            unfreeze_backbone=args.unfrozen,
                            train_refine_only=refine)
    step = make_train_step(model, settings, tx,
                           unfreeze_backbone=args.unfrozen, remat=args.remat)
    opt_state = tx.init(variables["params"])

    b, k = args.batch, 5
    batch = {
        "template": jnp.asarray(rng.uniform(0, 255, (b, 127, 127, 3)), jnp.float32),
        "search": jnp.asarray(rng.uniform(0, 255, (b, search, search, 3)), jnp.float32),
        "label_cls": jnp.asarray(rng.choice([-1, 0, 1], size=(b, k, size, size),
                                            p=[0.8, 0.15, 0.05]), jnp.int32),
        "label_loc": jnp.asarray(rng.randn(b, 4, k, size, size) * 0.1, jnp.float32),
        "label_loc_weight": jnp.asarray(rng.rand(b, k, size, size) < 0.1, jnp.float32),
        "label_mask": jnp.asarray(np.sign(rng.randn(b, search, search)), jnp.float32),
        "label_mask_weight": jnp.asarray(rng.rand(b, size, size) < 0.05, jnp.float32),
    }
    lr = jnp.float32(0.005)
    _phase("train inputs built")

    # analytic FLOPs BEFORE the first execution: the step donates its
    # variables/opt_state buffers, so tracing with the post-loop (deleted)
    # arrays would fail. With the packed thin-conv lowering the MFU
    # numerator must stay the MODEL's FLOPs, not the lowering's (the packed
    # 2x2 kernel carries 16/9 structural zeros) — trace the unpacked step
    # for counting only. clone() keeps the counting model's every other knob
    # identical to the measured one by construction.
    if refine and args.packed_threshold:
        ref_step = make_train_step(model.clone(packed_conv_threshold=0),
                                   settings, tx,
                                   unfreeze_backbone=args.unfrozen,
                                   remat=args.remat)
        fpb = _flops_per_frame(ref_step, (variables, opt_state, batch, lr), 1)
    else:
        fpb = _flops_per_frame(step, (variables, opt_state, batch, lr), 1)

    # K chained steps per dispatch (mirrors the tracker's scan benchmark):
    # host-driven per-step dispatch through the tunnel relay measured wall
    # times BELOW the device's own per-step busy time from a profiler trace
    # (the relay acks before execution drains), so a per-step python loop
    # reports fiction. One scanned program per dispatch forces the wall clock
    # to cover the full device execution.
    K = 8

    @jax.jit
    def multi_step(variables, opt_state, batch, lr):
        def body(carry, _):
            v, o = carry
            v, o, m = step(v, o, batch, lr)
            return (v, o), m["total_loss"]

        (v, o), losses = jax.lax.scan(body, (variables, opt_state), None,
                                      length=K)
        return v, o, losses

    _phase("train step built")
    variables, opt_state, losses = multi_step(variables, opt_state, batch, lr)
    # compile+warmup barrier MUST be a data fetch: block_until_ready on this
    # relay can resolve while the remote compile/execution is still running,
    # which then lands ~99 s of leftover wait inside the first timed dispatch
    float(np.asarray(losses)[-1])
    _phase("train step compiled + warm")

    iters = max(1, args.iters // 128) * K
    soft = _soft_deadline()
    done = 0
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for _i in range(iters // K):
        _t = time.perf_counter()
        variables, opt_state, losses = multi_step(variables, opt_state,
                                                  batch, lr)
        # Drain with a HOST DATA FETCH after EVERY dispatch. Two relay
        # pathologies force this design: (a) block_until_ready acks before
        # execution drains once the queue is >1 deep (a trace showed 87
        # ms/step device busy while a blocking 8-deep wall loop reported 1
        # ms/step), and (b) a data fetch behind a deep queue degrades ~1000x
        # (185 s to read 32 bytes behind 8 dispatches; 27 ms behind one).
        # At queue depth 1 both are honest; the small fetch adds one RTT per
        # K-step window (~4% at K=8).
        final_loss = float(np.asarray(losses)[-1])
        done += 1
        if os.environ.get("BENCH_DEBUG"):
            print(f"dispatch {_i}: {(time.perf_counter() - _t) * 1e3:.1f} ms "
                  f"loss={final_loss:.2f}", flush=True)
        if time.time() > soft:
            # summary child out of row budget: stop here with an honest
            # shorter measurement (every dispatch above is fully drained)
            # rather than let the parent SIGKILL a device-active process
            break
    dt = time.perf_counter() - t0
    if args.profile_dir:
        jax.profiler.stop_trace()
    assert np.isfinite(final_loss)

    clamped = done < iters // K
    iters = done * K
    sps = iters * b / dt
    extras = {"device_step_ms": round(dt / iters * 1e3, 2), "batch": b,
              "phase": "unfrozen" if args.unfrozen else "frozen"}
    if clamped:
        extras["iters_clamped"] = iters
    peak = PEAK_FLOPS.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"))
    if fpb and peak:
        mfu = 100.0 * fpb * (iters / dt) / peak
        # the jaxpr walk counts what was traced; frozen-phase backbone
        # backward is already cut at trace time by stop_gradient, so this is
        # the executed work. Always emit the numbers — an MFU >= 100% means
        # the FLOP walker overcounted (or the wall clock lied) and hiding it
        # would mask exactly that bug; flag it instead.
        extras["train_gflops_per_step"] = round(fpb / 1e9, 1)
        extras["train_mfu_pct"] = round(mfu, 2)
        if mfu >= 100.0:
            extras["mfu_suspect"] = True
    stage = "refine" if refine else "base"
    _emit_result({
        "metric": f"siammask_{stage}_train_samples_per_s_b{b}",
        "value": round(sps, 1),
        "unit": "samples/s",
        # the reference trains both stages at the same data rate (20 epochs x
        # 600k pairs in ~10 h on 4x V100; README.md:174, run.sh both stages)
        "vs_baseline": round(sps / BASELINE_TRAIN_SPS, 3),
        **extras,
    }, _bench_cache_key(args))


def _check_backend_reachable(window_s: int | None = None):
    """Wait for the backend with retry-and-backoff instead of failing once.

    When the axon tunnel is down, ``jax.devices()`` blocks indefinitely inside
    backend setup (measured: >9 min with zero output; the block sits in a C
    gRPC call, so an in-process SIGALRM is never delivered) — under the
    driver's timeout that records an opaque rc=124. Backend INIT normally
    takes seconds (remote COMPILES are minutes, but happen later), so probe it
    in short-lived subprocesses with hard timeouts. A single 600 s probe is
    exactly what produced the empty BENCH_r03 during a transient outage, so
    the probe now RETRIES across a window (default 3600 s, env
    BENCH_TUNNEL_WINDOW_S) with escalating per-attempt timeouts — an outage
    shorter than the window costs waiting, not the round's perf record.
    Costs ~3 s when healthy."""
    import subprocess
    import sys
    window_s = int(os.environ.get("BENCH_TUNNEL_WINDOW_S", "3600")) \
        if window_s is None else window_s
    deadline = time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        # short first probes catch a healthy tunnel fast; later ones allow a
        # slow-recovering tunnel a full init
        probe_s = min(600, 120 * attempt)
        probe_s = min(probe_s, max(30, deadline - time.monotonic()))
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_s, check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise RuntimeError(
                    f"JAX backend "
                    f"'{os.environ.get('JAX_PLATFORMS', 'default')}' did not "
                    f"initialize within {window_s}s across {attempt} probes — "
                    "the axon TPU tunnel is unreachable (this is environment "
                    "downtime, not a bench failure)") from None
            print(f"bench: tunnel probe {attempt} failed ({probe_s:.0f}s); "
                  f"retrying for another {remaining:.0f}s", file=sys.stderr,
                  flush=True)
            time.sleep(min(60, max(0, remaining)))


_CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_cache.json")


def _emit_result(payload: dict, cache_key: str):
    """Print the one-line JSON result AND persist it as the last good result
    for this bench mode, so a future run behind a dead tunnel can emit it
    with a ``stale: true`` marker instead of recording nothing."""
    print(json.dumps(payload))
    try:
        cache = _load_cache()
        cache[cache_key] = {**payload, "cached_at": time.strftime(
            "%Y-%m-%dT%H:%M:%S%z")}
        with open(_CACHE_FILE, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # caching is best-effort; never fail the bench over it


def _soft_deadline() -> float:
    """Absolute time.time() after which a measurement should wrap up.

    Set (as BENCH_SOFT_DEADLINE) by run_summary for its row children so a
    slow row ends with an honest, shorter measurement instead of being
    SIGKILLed mid-dispatch — killing a device-active process can wedge the
    chip for minutes (CLAUDE.md). Unset => inf (standalone runs unchanged).
    The parent's hard kill remains as the backstop for rows that hang in a
    cold remote compile, where no in-process check can run."""
    v = os.environ.get("BENCH_SOFT_DEADLINE")
    return float(v) if v else float("inf")


def _bench_cache_key(args) -> str:
    """Canonical cache key for a bench configuration.

    Knobs a mode does not consume are normalized to their defaults before
    keying (advisor r4: a scan run with --packed-threshold 32 used to
    re-measure an identical program under a fresh key): the tracker modes
    ignore every training knob, the base-train mode additionally ignores the
    refine-only conv lowerings, and the training modes ignore the tracker's
    scan geometry."""
    sig = {k: v for k, v in sorted(vars(args).items())
           if k not in ("profile_dir", "iters", "summary")}
    defaults = {k: p.default for k, p in
                _build_parser()._option_string_actions.items()}
    train_mode = sig.get("train") or sig.get("train_refine")
    ignored = ["scan", "streams", "per_step"] if train_mode else \
        ["batch", "remat", "unfrozen", "thin_threshold", "packed_threshold"]
    if train_mode and not sig.get("train_refine"):
        ignored += ["thin_threshold", "packed_threshold"]
    if not train_mode and sig.get("per_step"):
        ignored += ["scan"]  # per-step mode times single-frame dispatches
    for k in ignored:
        sig[k] = defaults["--" + k.replace("_", "-")]
    return json.dumps(sig, sort_keys=True)


def _load_cache() -> dict:
    """Read bench_cache.json, re-keying entries saved under older arg
    signatures onto the current canonical key (missing args filled with
    their parser defaults, ignored args normalized). On collision the
    newest ``cached_at`` wins; non-JSON keys are kept verbatim."""
    if not os.path.exists(_CACHE_FILE):
        return {}
    try:
        with open(_CACHE_FILE) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return {}
    base = vars(_build_parser().parse_args([]))
    cache: dict = {}
    for key, payload in raw.items():
        try:
            sig = json.loads(key)
        except ValueError:
            cache[key] = payload
            continue
        if not isinstance(sig, dict):
            cache[key] = payload
            continue
        merged = dict(base)
        merged.update({k: v for k, v in sig.items() if k in base})
        new_key = _bench_cache_key(argparse.Namespace(**merged))
        old = cache.get(new_key)
        if old is None or old.get("cached_at", "") <= payload.get(
                "cached_at", ""):
            cache[new_key] = payload
    return cache


def _build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--summary", action="store_true",
                        help="run the whole performance table (scan, 16-stream "
                             "serving, train frozen/unfrozen/refine) as "
                             "sequential subprocess rows and print ONE JSON "
                             "line: the scan headline plus a 'summary' dict "
                             "with every row. Rows that cannot be re-measured "
                             "inside BENCH_SUMMARY_BUDGET_S fall back to the "
                             "last good cached number, marked from_cache. "
                             "Default when bench.py runs with no arguments "
                             "(the driver invocation).")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of the timed loop here")
    # default sized so the scan mode issues enough 64-frame windows (16) to
    # amortize the per-dispatch relay RTT of this tunneled dev chip: at 128
    # iters (2 windows) the identical program measured 328 FPS, at 1024 it
    # converges to ~1100 FPS with a stable 0.91 ms device step
    parser.add_argument("--iters", type=int, default=1024)
    parser.add_argument("--fp32", action="store_true",
                        help="fp32 compute (default bfloat16, params fp32)")
    parser.add_argument("--xcorr", default=None,
                        choices=["mm", "conv", "shift", "pallas"],
                        help="depthwise-xcorr lowering (ops/xcorr.py); "
                             "default 'shift' everywhere: at the training "
                             "shapes the im2col 'mm' path is a batch-element "
                             "matvec the MXU hates (3x8.6 ms/step at batch 64 "
                             "vs <1 ms as 25 VPU shift-FMAs)")
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
    parser.add_argument("--train", action="store_true",
                        help="benchmark the training step instead (SiamMask-"
                             "base stage-1 layout: batch of 127/255 pairs, "
                             "fwd+bwd+SGD on one chip); reports samples/s vs "
                             "the reference's 4xV100 training throughput")
    parser.add_argument("--train-refine", action="store_true",
                        help="benchmark the stage-2 refine training step "
                             "(sharp 143x143 search, mask+refine params only, "
                             "frozen-BN backbone+rpn)")
    parser.add_argument("--batch", type=int, default=64,
                        help="--train mode global batch (reference run.sh: 64)")
    parser.add_argument("--thin-threshold", type=int, default=0,
                        help="--train-refine: Ci*Co at or below this lower "
                             "3x3 convs as 9 VPU shift-FMAs instead of an "
                             "MXU conv (the batch-1 tracker's latency "
                             "lowering; measures whether the refine "
                             "decoder's thin convs — Co=16/4/1 filling "
                             "3-13% of the MXU's output width — also win "
                             "at training batch sizes)")
    parser.add_argument("--packed-threshold", type=int, default=0,
                        help="--train-refine: Co at or below this lower 3x3 "
                             "convs as a 2x2 conv over block-2 space-to-"
                             "depth-packed pixels (heads._conv3x3_packed) — "
                             "4x the MXU output-lane fill for a 16/9 "
                             "structural-zero FLOP overhead; the batched-"
                             "path counterpart of --thin-threshold")
    parser.add_argument("--remat", action="store_true",
                        help="--train mode: rematerialized backward")
    parser.add_argument("--unfrozen", action="store_true",
                        help="--train mode: epoch>=50%% phase (backbone "
                             "layer2/3 training; the expensive backward)")
    return parser


# the five driver-attested rows of the README performance table; the first is
# the headline (its metric/value stay top-level for BENCH_r0N compatibility)
_SUMMARY_ROWS = (
    # every row MUST carry at least one explicit flag: a bare `python
    # bench.py` routes to summary mode, so a flagless row would recurse
    # (measured once: a fork bomb ~100 processes deep). A BENCH_IN_SUMMARY
    # env guard backstops this invariant.
    ("scan", ["--scan", "64"]),
    ("serving_16streams", ["--streams", "16"]),
    ("train_frozen", ["--train"]),
    ("train_unfrozen", ["--train", "--unfrozen"]),
    ("train_refine", ["--train-refine"]),
)


def run_summary():
    """Measure every row of the performance table in ONE bench invocation.

    Each row runs as its own subprocess (`python bench.py <row flags>`), so a
    row that hangs (cold remote compile, tunnel outage) can be bounded without
    taking the whole attestation down. Budget discipline: rows run until
    BENCH_SUMMARY_BUDGET_S (default 420 s — inside the driver's own timeout)
    is spent; each child gets a BENCH_SOFT_DEADLINE so its measurement loop
    wraps up with an honest shorter reading in time. A row that still
    overruns (cold remote compile) is ABANDONED — never killed (a mid-run
    SIGKILL wedges the chip/compile service for the next process; measured
    18-min recompile of a warm program right after one) — it finishes in the
    background and banks its result to bench_cache.json for next time, while
    the remaining rows are emitted from the last good cache, marked
    ``from_cache`` (no second device process while the orphan owns the
    chip). Children probe the tunnel with a short window
    (BENCH_TUNNEL_WINDOW_S=90) and emit their own stale-cache fallback if it
    is down. The parent always prints the final line."""
    import subprocess
    import sys

    if os.environ.get("BENCH_IN_SUMMARY"):
        raise RuntimeError(
            "run_summary re-entered from a summary child — a row's argv must "
            "carry an explicit flag so the child takes a single-mode path")
    budget = float(os.environ.get("BENCH_SUMMARY_BUDGET_S", "420"))
    t0 = time.monotonic()
    import tempfile

    cache = _load_cache()
    results = {}
    abandoned = False
    for name, argv in _SUMMARY_ROWS:
        key = _bench_cache_key(_build_parser().parse_args(argv))
        banked = cache.get(key)
        remaining = budget - (time.monotonic() - t0)
        if abandoned or remaining < 45:
            reason = ("an earlier row still owns the chip (left running, "
                      "its result banks to the cache)" if abandoned
                      else "summary budget exhausted")
            results[name] = ({**banked, "from_cache": True,
                              "cache_reason": reason} if banked else
                             {"error": f"no measurement: {reason}"})
            continue
        env = dict(os.environ)
        env.setdefault("BENCH_TUNNEL_WINDOW_S", "90")
        env["BENCH_IN_SUMMARY"] = "1"
        # soft deadline 30 s inside the row budget: measurement loops wrap up
        # with an honest shorter reading instead of overrunning
        env["BENCH_SOFT_DEADLINE"] = str(time.time()
                                         + max(30.0, remaining - 30.0))
        # A row that overruns anyway (cold remote compile — the one phase no
        # in-process check can bound) is ABANDONED, never SIGKILLed: killing
        # a device-active child wedges the chip/compile service for the NEXT
        # process (measured: the identical scan program re-compiled 18 min
        # cold right after a mid-compile kill, vs 70 s warm before it). The
        # orphan finishes in the background and _emit_result banks its
        # number into bench_cache.json for the next invocation; no further
        # row starts (one TPU process at a time). Child stdout/stderr go to
        # temp FILES, not pipes, so an abandoned child can never block on a
        # full pipe buffer.
        out_f = tempfile.NamedTemporaryFile("w+", suffix=f"_{name}.out",
                                            delete=False)
        err_f = tempfile.NamedTemporaryFile("w+", suffix=f"_{name}.err",
                                            delete=False)
        try:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)] + argv,
                stdout=out_f, stderr=err_f, text=True, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            try:
                rc = proc.wait(timeout=remaining)
            except subprocess.TimeoutExpired:
                abandoned = True
                results[name] = ({**banked, "from_cache": True,
                                  "cache_reason":
                                  f"row exceeded its {remaining:.0f}s budget;"
                                  " left running (banks to cache), NOT killed"
                                  " (a mid-run kill wedges the chip)"}
                                 if banked else
                                 {"error": f"exceeded {remaining:.0f}s, "
                                           "no cached value"})
                continue
            out_f.seek(0)
            err_f.seek(0)
            stdout, stderr = out_f.read(), err_f.read()
            payload = None
            for line in reversed(stdout.strip().splitlines()):
                try:
                    payload = json.loads(line)
                    break
                except ValueError:
                    continue
            for ln in stderr.splitlines():
                if ln.startswith("bench: "):  # child phase breadcrumbs
                    print(f"  [{name}] {ln[7:]}", file=sys.stderr, flush=True)
            if rc != 0 or payload is None:
                raise RuntimeError(f"rc={rc}: {stderr.strip()[-300:]}")
            results[name] = payload
        except (RuntimeError, OSError) as e:
            results[name] = ({**banked, "from_cache": True,
                              "cache_reason": str(e)[:300]} if banked else
                             {"error": str(e)[:300]})
        finally:
            for f in (out_f, err_f):
                try:
                    f.close()
                    if not abandoned:
                        os.unlink(f.name)
                except OSError:
                    pass
        print(f"bench summary: {name} done "
              f"[{time.monotonic() - t0:.0f}s/{budget:.0f}s]",
              file=sys.stderr, flush=True)

    headline = results[_SUMMARY_ROWS[0][0]]
    top = {k: headline[k] for k in ("metric", "value", "unit", "vs_baseline")
           if k in headline} or {"metric": "siammask_summary", "value": 0.0,
                                 "unit": "fps", "vs_baseline": 0.0}
    print(json.dumps({**top, "summary": results}))


def main():
    import sys
    args = _build_parser().parse_args()
    if args.summary or len(sys.argv) == 1:
        return run_summary()
    if args.packed_threshold and not args.train_refine:
        print("bench: --packed-threshold only affects --train-refine; "
              "ignored in this mode", file=sys.stderr)
    if args.thin_threshold and not args.train_refine:
        print("bench: --thin-threshold only affects --train-refine; "
              "ignored in this mode", file=sys.stderr)
    cached = _load_cache().get(_bench_cache_key(args)) or {}
    try:
        # adaptive retry window: with a last-good result banked, stop probing
        # early enough to EMIT it inside the driver's own timeout (a 3600 s
        # wait under a ~600 s driver budget records rc=124 and nothing at
        # all — strictly worse than a stale number); with nothing banked,
        # ride out the full window hoping the tunnel recovers
        window = 420 if cached else None
        if os.environ.get("BENCH_TUNNEL_WINDOW_S"):
            window = None  # explicit env wins either way
        _check_backend_reachable(window_s=window)
        _phase("tunnel probe ok")
    except RuntimeError as down:
        # tunnel stayed down for the whole retry window: emit the last good
        # result for this mode, marked stale, rather than recording nothing
        if cached:
            print(json.dumps({**cached, "stale": True,
                              "stale_reason": str(down)}))
            return
        raise
    if args.train or args.train_refine:
        return bench_train(args)
    from siammask_tpu.config import TrackerConfig
    from siammask_tpu.models.siammask import SiamMaskSharp
    from siammask_tpu.tracker.tracker import Tracker

    hp = {"instance_size": 255, "out_size": 127, "base_size": 8,
          "seg_thr": 0.35, "penalty_k": 0.04, "window_influence": 0.4, "lr": 1.0}
    p = TrackerConfig().update(hp)

    model = SiamMaskSharp(dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
                          xcorr_impl=args.xcorr or "shift")
    rng = np.random.RandomState(0)
    z = jnp.zeros((1, 127, 127, 3), jnp.float32)
    x = jnp.zeros((1, 255, 255, 3), jnp.float32)
    variables = _fast_init(model, z, x)
    _phase("model params initialized")

    tracker = Tracker(model, p, mask=True, refine=True)

    im_h, im_w = 480, 854  # DAVIS frame geometry
    # uint8 frames, as decoded video actually arrives (and 4x less HBM for the
    # per-frame slice of the stacked scan input); the step casts on device
    frame = jnp.asarray(rng.uniform(0, 255, (im_h, im_w, 3)), jnp.uint8)

    extras = {}
    peak = PEAK_FLOPS.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"))

    if not args.per_step:
        # ---- default: whole-video scan (dispatch-insensitive device metric).
        # --streams N > 1 scans the object-batched step instead (N independent
        # streams advance per scan iteration — the fully device-resident
        # serving layout, tracker.track_video_multi).
        t_frames = args.scan
        n_st = args.streams
        if n_st > 1:
            pos = rng.uniform(100, 400, (n_st, 2)).astype(np.float32)
            sz = rng.uniform(60, 200, (n_st, 2)).astype(np.float32)
            state = tracker.init_batched(variables, frame, pos, sz)
            run = tracker.track_video_multi
            scan_fn = type(tracker)._scan_multi_jit
        else:
            state = tracker.init(variables, frame,
                                 np.array([427.0, 240.0]),
                                 np.array([120.0, 160.0]))
            run = tracker.track_video
            scan_fn = type(tracker)._scan_jit
        frames = jnp.broadcast_to(frame, (t_frames,) + frame.shape)
        _phase("tracker state initialized")
        _, out = run(variables, state, frames)  # compile
        float(np.asarray(out.score).ravel()[-1])  # data-fetch barrier
        _phase("scan program compiled + warm")
        reps = max(1, args.iters // t_frames)
        soft = _soft_deadline()
        if np.isfinite(soft):
            # summary child: size the measurement to the remaining row budget
            # up front (the measured loop chains state with ONE end fetch, so
            # it cannot be interrupted between windows). One probed window —
            # dispatch + fetch, an overestimate of the chained per-window
            # cost, hence conservative — sets the fit.
            t1 = time.perf_counter()
            _, out = run(variables, state, frames)
            float(np.asarray(out.score).ravel()[-1])
            window = time.perf_counter() - t1
            fit = int((soft - time.time()) / max(window, 1e-3) * 0.8)
            if fit < reps:
                reps = max(2, fit)
                extras["reps_clamped"] = reps
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.perf_counter()
        st = state
        for _ in range(reps):
            st, out = run(variables, st, frames)
        # END-ONLY data fetch: transitively honest (each rep's state chains
        # the previous, so reading the last score waits for every rep) and it
        # keeps the device pipe full between windows. A per-rep drain costs a
        # flat ~30 ms relay RTT per 64-frame window (84% overhead at batch 1)
        # and the deep-queue fetch pathology that forces per-dispatch drains
        # in bench_train has not been observed for the scan programs.
        float(np.asarray(out.score).ravel()[-1])
        dt = time.perf_counter() - t0
        if args.profile_dir:
            jax.profiler.stop_trace()
        _phase(f"measurement done ({reps} windows)")
        n = reps * t_frames * n_st
        fps = n / dt
        extras["device_step_us"] = round(dt / n * 1e6, 1)
        # the scan entry points are jitted METHODs (self is static argnum 0):
        # .lower must be reached through the class attribute with self explicit
        fpf = _flops_per_frame(scan_fn,
                               (tracker, variables, state, frames),
                               t_frames * n_st)
        _phase("FLOP walk done")
        if fpf and peak:
            extras["model_gflops_per_frame"] = round(fpf / 1e9, 3)
            extras["mfu_pct"] = round(100.0 * fpf * fps / peak, 3)
        metric = (f"siammask_sharp_scan_fps_T{t_frames}" if n_st == 1 else
                  f"siammask_sharp_scan_aggregate_fps_{n_st}streams")
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
        float(np.asarray(out.score).ravel()[-1])  # data-fetch barrier

        iters = args.iters
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.perf_counter()
        st = state
        for _ in range(iters):
            st, out = step(st)
        float(np.asarray(out.score).ravel()[-1])  # honest data-fetch sync
        dt = time.perf_counter() - t0
        if args.profile_dir:
            jax.profiler.stop_trace()
        fps = iters * args.streams / dt
        extras["device_step_us"] = round(dt / (iters * args.streams) * 1e6, 1)
        metric = ("siammask_sharp_track_step_fps_per_chip"
                  if args.streams == 1 else
                  f"siammask_sharp_track_aggregate_fps_{args.streams}streams")

    _emit_result({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        **extras,
    }, _bench_cache_key(args))


if __name__ == "__main__":
    main()
