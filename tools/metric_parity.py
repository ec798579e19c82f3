"""Metric-level parity: EAO / Accuracy / Robustness and VOS J/F deltas between
our full stack and the actual reference stack, offline.

Lifts the trajectory-level bound of tools/parity_report.py to the metric level
(round-2 VERDICT Missing #2): both trackers get IDENTICAL tempered weights and
run the FULL VOT reset protocol (`tools/test.py:318-418` vs
`siammask_tpu/tracker/vot.py`) and VOS fusion (`tools/test.py:459-542` vs
`tracker/vos.py`) over pseudo-sequences built from the real tennis clip, each
writing its own result tree. Both trees are then scored twice — once with our
eval toolkit and once with the reference pysot eval imported under a numba
stub — yielding:

- **tracker deltas**: EAO/A/R and J/F between the two stacks on the same
  benchmark (the metric-gate bound: identical weights -> near-identical
  metrics);
- **eval deltas**: our eval vs pysot on the SAME result tree (must be ~0 to
  machine precision; the protocol-math differential).

Benchmark construction (self-contained, zero network):
- two ~205-frame pseudo-sequences re-ordering the 69 tennis frames
  (fwd+rev+fwd / rev+fwd+rev) so the EAO 100..356 interval has support;
- gt = the reference stack's own no-reset closed-loop trajectory (axis-
  aligned), displaced by +2000px over two 5-frame windows per video to force
  deterministic failures -> both stacks exercise lost-marking, 5-frame skip,
  and re-init from gt;
- VOS pseudo-gt masks = the reference's no-reset thresholded masks.

Run: python tools/metric_parity.py [--platform tpu] [--precision default]
Writes the delta table into PARITY_METRICS.md (--append) and prints JSON.
"""
import argparse
import json
import os
import sys
import types
from os.path import dirname, exists, join, realpath

REPO = dirname(dirname(realpath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, join(REPO, "tools"))

import cv2
import numpy as np

import parity_report
from parity_report import ANCHORS, HP, REFERENCE

FAIL_WINDOWS = (60, 140)     # forced-failure window starts (5 frames each)
DISPLACE = 2000.0            # gt displacement that guarantees zero overlap


def _tennis_frames(n=70):
    frames = []
    for i in range(n):
        im = cv2.imread(join(REFERENCE, "data", "tennis", f"{i:05d}.jpg"))
        if im is None:
            break
        frames.append(im)
    return frames


def _orders(n):
    fwd = list(range(n))
    rev = list(range(n - 2, 0, -1))
    return {"v0": fwd + rev + fwd[:n - 1],
            "v1": list(reversed(fwd)) + fwd[1:] + list(reversed(fwd))[1:n - 1]}


def _rect_poly(pos, sz):
    x1, y1 = pos[0] - sz[0] / 2, pos[1] - sz[1] / 2
    x2, y2 = pos[0] + sz[0] / 2, pos[1] + sz[1] / 2
    return [x1, y1, x1, y2, x2, y2, x2, y1]


def _ref_noreset_run(ref_test, net, images, pos0, sz0, want_masks=False):
    """Closed-loop reference pass with no resets: the gt generator."""
    import torch

    gt = [_rect_poly(pos0, sz0)]
    masks = [None]
    with torch.no_grad():
        state = ref_test.siamese_init(images[0], pos0.copy(), sz0.copy(), net,
                                      HP, device="cpu")
        for im in images[1:]:
            state = ref_test.siamese_track(state, im, mask_enable=True,
                                           refine_enable=True, device="cpu")
            gt.append(_rect_poly(state["target_pos"], state["target_sz"]))
            if want_masks:
                masks.append(state["mask"] > HP["seg_thr"])
    return gt, masks


def _displace_gt(gt):
    gt = [list(g) for g in gt]
    for k in FAIL_WINDOWS:
        for f in range(k, min(k + 5, len(gt))):
            gt[f] = [c + DISPLACE for c in gt[f]]
    return gt


def _install_pysot():
    """Reference pysot eval under numba/region stubs (tests/test_pysot_oracle)."""
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba.jit = jit
    sys.modules.setdefault("numba", numba)
    from siammask_tpu.eval import region as our_region
    sys.modules.setdefault("utils.pysot.utils.region", our_region)
    from utils.pysot.datasets.vot import VOTDataset as RefVOTDataset
    from utils.pysot.evaluation import AccuracyRobustnessBenchmark as RefAR
    from utils.pysot.evaluation import EAOBenchmark as RefEAO
    return RefVOTDataset, RefAR, RefEAO


def _summarize_ar(result):
    import itertools
    ret = next(iter(result.values()))
    overlaps = list(itertools.chain(*ret["overlaps"].values()))
    length = sum(len(x) for x in ret["overlaps"].values())
    failures = list(ret["failures"].values())
    return {"accuracy": float(np.nanmean(overlaps)),
            "lost": float(np.mean(np.sum(failures, axis=0))),
            "robustness": float(np.mean(np.sum(np.array(failures), axis=0)
                                        / length) * 100)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=70)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    parser.add_argument("--precision", default="float32",
                        choices=["default", "float32"])
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="OUR model's compute dtype (the bench headlines "
                             "bfloat16; the reference always runs fp32 torch) "
                             "— measures the bf16 deployment metric delta")
    parser.add_argument("--xcorr", default="shift",
                        choices=["mm", "conv", "shift", "pallas"])
    parser.add_argument("--latency-lowerings", default="auto",
                        choices=["auto", "on", "off"],
                        help="batch-1 latency clone lowerings (s2d stem / "
                             "shift thin convs / phase maxpool) on OUR "
                             "tracker. 'auto' = on only for the bf16 "
                             "deployment-delta mode (--dtype bfloat16): the "
                             "fp32 run is the IMPLEMENTATION-parity "
                             "configuration and must compare algorithms, not "
                             "~1-ULP lowering reduction orders, which "
                             "closed-loop razor-edge random weights amplify "
                             "into divergent resets (each lowering's numeric "
                             "equivalence is unit-pinned separately)")
    parser.add_argument("--work-dir", default="/tmp/metric_parity")
    parser.add_argument("--append", action="store_true",
                        help="append the delta table to PARITY_METRICS.md")
    parser.add_argument("--skip-vos", action="store_true")
    parser.add_argument("--box-only", action="store_true",
                        help="report axis-aligned boxes instead of mask-"
                             "derived rotated polygons (reference --mask off "
                             "mode). Isolates protocol+trajectory parity from "
                             "the minAreaRect contour noise of tempered-"
                             "random masks; implies --skip-vos")
    parser.add_argument("--json-out", default=None,
                        help="also write the result JSON to this path")
    parser.add_argument("--weights", default=None,
                        help="OUR .msgpack checkpoint to run BOTH stacks with "
                             "(pushed into the torch reference net via "
                             "utils.torch_convert.invert_variables) instead "
                             "of LSUV-tempered random weights — the trained-"
                             "weights parity configuration")
    parser.add_argument("--init-box", default=None,
                        help="cx,cy,w,h init target box (default: the "
                             "tempered-harness torso box; trained-weights "
                             "runs should pass the checkpoint's "
                             "in-distribution box, e.g. the tennis player: "
                             "387,238,165,260)")
    args = parser.parse_args()

    if args.platform:
        from siammask_tpu.parallel.mesh import force_platform
        force_platform(args.platform)
    import jax
    jax.config.update("jax_default_matmul_precision", args.precision)

    import shutil
    root = args.work_dir
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(join(root, "test"))

    # ---- reference stack with REAL region overlap (the parity_report loader
    # stubs pyvotkit with a constant; the reset protocol needs the real one)
    ref_test, net = parity_report.load_reference()
    from siammask_tpu.eval.region import vot_float2str, vot_overlap
    ref_test.vot_overlap = vot_overlap
    ref_test.vot_float2str = vot_float2str
    ref_test.args = types.SimpleNamespace(
        dataset="VOT2018", debug=False, visualization=False, arch="ref",
        resume="w.pth", save_mask=True)
    ref_test.v_id = 0
    if not hasattr(ref_test, "logger"):
        import logging
        ref_test.logger = logging.getLogger("ref")
    ref_test.thrs = np.arange(0.3, 0.5, 0.05)

    frames = _tennis_frames(args.frames)
    print(f"{len(frames)} tennis frames", flush=True)
    if args.weights:
        # trained-weights mode: our checkpoint drives BOTH stacks
        import torch

        from siammask_tpu.train.checkpoint import load_checkpoint
        from siammask_tpu.utils.torch_convert import invert_variables

        ckpt_vars = load_checkpoint(args.weights)["variables"]
        state = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in invert_variables(ckpt_vars).items()}
        net.load_state_dict(state, strict=True)
        print(f"loaded {len(state)} tensors from {args.weights} into the "
              f"reference net", flush=True)
    else:
        parity_report.temper_reference_net(net, frames[0])

    # ---- our stack, same weights
    import jax.numpy as jnp

    from siammask_tpu.config import TrackerConfig
    from siammask_tpu.models.siammask import SiamMaskSharp
    from siammask_tpu.tracker.runtime import TrackerRuntime
    from siammask_tpu.tracker.vos import track_vos
    from siammask_tpu.tracker.vot import track_vot
    from siammask_tpu.utils.torch_convert import convert_state_dict

    variables = convert_state_dict(
        {k: v.detach().numpy() for k, v in net.state_dict().items()})
    p = TrackerConfig().update(HP, ANCHORS)
    our_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    mask_on = not args.box_only
    if args.box_only:
        args.skip_vos = True
    lat = (args.latency_lowerings == "on" or
           (args.latency_lowerings == "auto" and args.dtype == "bfloat16"))
    runtime = TrackerRuntime(
        SiamMaskSharp(xcorr_impl=args.xcorr, dtype=our_dtype), variables,
        p, mask=mask_on, refine=mask_on, latency_lowerings=lat)

    # Default init: the narrow torso box the tempered-random-weight harness
    # was built around. For --weights (trained-checkpoint) runs pass
    # --init-box with an in-distribution target box: an overfit checkpoint
    # started off-distribution produces an unstable closed loop in BOTH
    # stacks (measured: from this default box even the fp32 trained tracker
    # leaves the player within frames, so the ref-trajectory pseudo-gt is
    # chaos — any ~ULP perturbation then reads as a huge fake metric delta).
    if args.init_box:
        cx, cy, bw, bh = (float(v) for v in args.init_box.split(","))
        pos0, sz0 = np.array([cx, cy]), np.array([bw, bh])
    else:
        pos0 = np.array([336.0, 175.0])
        sz0 = np.array([56.0, 140.0])
    h, w = frames[0].shape[:2]

    # ---- build the pseudo-VOT benchmark (gt from the reference itself)
    meta = {}
    videos = {}
    for name, order in _orders(len(frames)).items():
        seq = [frames[i] for i in order]
        print(f"gt generation ({name}, {len(seq)} frames)...", flush=True)
        gt, _ = _ref_noreset_run(ref_test, net, seq, pos0, sz0)
        gt = _displace_gt(gt)
        videos[name] = {"image_files": order, "gt": np.asarray(gt),
                        "name": name, "frames": seq}
        meta[name] = {
            "video_dir": name, "init_rect": [0, 0, 1, 1],
            "img_names": [f"{name}/{i:08d}.jpg" for i in range(len(seq))],
            "gt_rect": gt, "width": w, "height": h,
            **{t: [0] * len(seq) for t in
               ("camera_motion", "illum_change", "motion_change",
                "size_change", "occlusion")},
        }
    with open(join(root, "VOT2018.json"), "w") as f:
        json.dump(meta, f)

    # ---- frame reading shim: both drivers cv2.imread(image_file) — serve
    # the in-memory reordered frames through an index-keyed fake path
    frame_store = {}
    for name, v in videos.items():
        for i, im in enumerate(v["frames"]):
            frame_store[f"@{name}/{i:05d}"] = im
    real_imread = cv2.imread
    cv2.imread = lambda p, *a: (frame_store[p] if p in frame_store
                                else real_imread(p, *a))
    try:
        for name, v in videos.items():
            video = {"image_files": [f"@{name}/{i:05d}"
                                     for i in range(len(v["frames"]))],
                     "gt": v["gt"], "name": name}
            print(f"VOT protocol ({name}): reference...", flush=True)
            cwd = os.getcwd()
            os.chdir(root)
            try:
                import torch
                with torch.no_grad():
                    ref_test.track_vot(net, video, hp=HP, mask_enable=mask_on,
                                       refine_enable=mask_on, device="cpu")
            finally:
                os.chdir(cwd)
            print(f"VOT protocol ({name}): ours...", flush=True)
            track_vot(runtime, video, dataset="VOT2018", mask_enable=mask_on,
                      result_dir=join(root, "test"), tracker_name="ours")

        # ---- VOS: pseudo-gt annos from the reference's no-reset masks
        vos_summary = {}
        if not args.skip_vos:
            print("VOS pseudo-gt generation...", flush=True)
            _, masks = _ref_noreset_run(ref_test, net, frames, pos0, sz0,
                                        want_masks=True)
            anno_dir = join(root, "annos")
            os.makedirs(anno_dir)
            anno0 = np.zeros((h, w), np.uint8)
            x1, y1 = int(pos0[0] - sz0[0] / 2), int(pos0[1] - sz0[1] / 2)
            anno0[y1:y1 + int(sz0[1]), x1:x1 + int(sz0[0])] = 1
            annos = [anno0] + [m.astype(np.uint8) for m in masks[1:]]
            anno_files = []
            for i, a in enumerate(annos):
                path = join(anno_dir, f"{i:05d}.png")
                cv2.imwrite(path, a)
                anno_files.append(path)
            # zero-padded fake names: saved mask PNGs are re-discovered by a
            # sorted glob, so lexicographic order must equal frame order
            vos_video = {"image_files": [f"@vos/{i:05d}"
                                         for i in range(len(frames))],
                         "anno_files": anno_files, "name": "tennis"}
            for i, im in enumerate(frames):
                frame_store[f"@vos/{i:05d}"] = im

            print("VOS fusion: reference...", flush=True)
            ref_test.args.dataset = "DAVISp"
            cwd = os.getcwd()
            os.chdir(root)
            try:
                import torch
                with torch.no_grad():
                    ref_test.track_vos(net, vos_video, hp=HP,
                                       mask_enable=True, refine_enable=True,
                                       mot_enable=False, device="cpu")
            finally:
                os.chdir(cwd)
            print("VOS fusion: ours...", flush=True)
            runtime_vos = TrackerRuntime(
                SiamMaskSharp(xcorr_impl=args.xcorr, dtype=our_dtype),
                variables, p, mask=True, refine=True,
                latency_lowerings=lat)
            track_vos(runtime_vos, vos_video, mot_enable=False,
                      result_dir=join(root, "test"), dataset="DAVISp",
                      tracker_name="ours", save_mask=True, log=lambda *a: None)

            from siammask_tpu.eval.davis import DAVISBenchmark
            ds = {"tennis": {"anno_files": anno_files,
                             "image_files": vos_video["image_files"],
                             "name": "tennis"}}
            bench = DAVISBenchmark(ds, "DAVISp", join(root, "test"))
            vres = {}
            vres.update(bench.eval("SiamMask"))   # the reference's fixed name
            vres.update(bench.eval("ours"))
            vsum = DAVISBenchmark.summarize(vres)
            vos_summary = {"ref": vsum["SiamMask"], "ours": vsum["ours"]}
    finally:
        cv2.imread = real_imread

    # ---- score both trees with OUR eval and with pysot
    from siammask_tpu.eval.benchmarks import (AccuracyRobustnessBenchmark,
                                              EAOBenchmark)
    from siammask_tpu.eval.datasets import VOTDataset

    # reference naming: arch + mask_/refine_ markers + resume stem
    ref_tree_name = "ref_" + ("mask_refine_" if mask_on else "") + "w"
    tracker_root = join(root, "test", "VOT2018")
    assert exists(join(tracker_root, ref_tree_name)), os.listdir(tracker_root)

    scores = {}
    ours_ds = VOTDataset("VOT2018", root)
    ours_ds.set_tracker(tracker_root, [ref_tree_name, "ours"])
    RefVOTDataset, RefAR, RefEAO = _install_pysot()
    ref_ds = RefVOTDataset("VOT2018", root)
    ref_ds.set_tracker(tracker_root, [ref_tree_name, "ours"])
    for tree in (ref_tree_name, "ours"):
        key = "ref" if tree == ref_tree_name else "ours"
        s = _summarize_ar(AccuracyRobustnessBenchmark(ours_ds).eval(tree))
        s["eao"] = EAOBenchmark(ours_ds).eval(tree)[tree]["all"]
        sp = _summarize_ar(RefAR(ref_ds).eval(tree))
        sp["eao"] = RefEAO(ref_ds).eval(tree)[tree]["all"]
        scores[key] = {"our_eval": s, "pysot_eval": sp}

    out = {
        "settings": {"platform": args.platform or "axon-default",
                     "precision": args.precision, "dtype": args.dtype,
                     "xcorr": args.xcorr, "videos": len(videos),
                     "report": "box" if args.box_only else "mask-polygon",
                     "frames_per_video": len(videos["v0"]["frames"])},
        "tracker_deltas": {
            m: abs(scores["ref"]["our_eval"][m] - scores["ours"]["our_eval"][m])
            for m in ("accuracy", "robustness", "lost", "eao")},
        "eval_deltas": {
            k: {m: abs(scores[k]["our_eval"][m] - scores[k]["pysot_eval"][m])
                for m in ("accuracy", "robustness", "lost", "eao")}
            for k in scores},
        "scores": scores,
        "vos": vos_summary,
    }
    if vos_summary:
        out["tracker_deltas"]["J"] = abs(vos_summary["ref"]["J_mean"]
                                         - vos_summary["ours"]["J_mean"])
        out["tracker_deltas"]["F"] = abs(vos_summary["ref"]["F_mean"]
                                         - vos_summary["ours"]["F_mean"])
    print(json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)

    if args.append:
        d = out["tracker_deltas"]
        s = scores
        rows = [
            ("EAO", s["ref"]["our_eval"]["eao"], s["ours"]["our_eval"]["eao"]),
            ("Accuracy", s["ref"]["our_eval"]["accuracy"],
             s["ours"]["our_eval"]["accuracy"]),
            ("Robustness", s["ref"]["our_eval"]["robustness"],
             s["ours"]["our_eval"]["robustness"]),
            ("Lost", s["ref"]["our_eval"]["lost"],
             s["ours"]["our_eval"]["lost"]),
        ]
        if vos_summary:
            rows += [("DAVIS-style J", vos_summary["ref"]["J_mean"],
                      vos_summary["ours"]["J_mean"]),
                     ("DAVIS-style F", vos_summary["ref"]["F_mean"],
                      vos_summary["ours"]["F_mean"])]
        eval_delta_max = max(v for k in out["eval_deltas"]
                             for v in out["eval_deltas"][k].values())
        table = "\n".join(
            f"| {m} | {r:.4f} | {o:.4f} | {abs(r - o):.4f} |"
            for m, r, o in rows)
        section = f"""
## Metric-level deltas (tools/metric_parity.py)

Both stacks, identical tempered weights, full VOT reset protocol + VOS fusion
over tennis pseudo-sequences ({out['settings']['videos']} videos x
{out['settings']['frames_per_video']} frames, 2 forced failures each); both
result trees scored with our eval AND the reference pysot eval (numba-stubbed).
Settings: platform={out['settings']['platform']},
precision={args.precision}, dtype={args.dtype}, xcorr={args.xcorr},
report={out['settings']['report']}.

| metric | reference stack | our stack | delta |
|---|---|---|---|
{table}

Eval-implementation agreement (ours vs pysot, same trees): max abs delta
{eval_delta_max:.2e} across EAO/A/R/lost on both trees.
"""
        with open(join(REPO, "PARITY_METRICS.md"), "a") as f:
            f.write(section)
        print("appended to PARITY_METRICS.md")


if __name__ == "__main__":
    main()
