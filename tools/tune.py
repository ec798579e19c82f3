"""Hyperparameter grid search over tracker inference params (VOT or VOS).

Mirrors `tools/tune_vot.py` / `tune_vos.py`: randomized grid over penalty_k x
window_influence x lr x instance_size (+ seg_thr for VOS), with the reference's
cooperative file-claim protocol — write an 'Occ' placeholder, skip existing
results, honor a finish.flag poison pill — so N independent processes share one
grid idempotently.

VOT cells are scored by EAO, the metric the grid exists to optimize: each cell
writes full per-video trajectory result files (the same writer `tools/test.py`
uses) under ``<out_dir>/results/<dataset>/<cell-tag>/`` and scores them with
the in-tree EAOBenchmark — the reference does exactly this split across two
steps (tune_vot.py:163-166 writes the trajectories, eval EAO-ranks them);
ranking by raw lost count can pick a different optimum than EAO.
"""
import argparse
import itertools
import random
import sys
from os.path import dirname, realpath

sys.path.insert(0, dirname(dirname(realpath(__file__))))

import numpy as np


def run_grid(grid, out_dir, tag_fn, score_fn, log=print):
    """The reference's cooperative grid protocol (tune_vot.py:77-89,214-241):
    claim a cell by writing an 'Occ' placeholder, skip cells another process
    already claimed/scored, stop when someone drops finish.flag. Returns the
    number of cells THIS process scored."""
    from os import makedirs
    from os.path import exists, isdir, join

    if not isdir(out_dir):
        makedirs(out_dir)
    finish_flag = join(out_dir, "finish.flag")
    done = 0
    for cell in grid:
        if exists(finish_flag):
            log("finish.flag present — stopping")
            break
        tag = tag_fn(cell)
        result_file = join(out_dir, tag + ".txt")
        if exists(result_file):  # claimed or done
            continue
        with open(result_file, "w") as f:
            f.write("Occ")  # cooperative claim
        score = score_fn(cell)
        with open(result_file, "w") as f:
            f.write(f"{tag} score {score}\n")
        log(f"{tag} score {score}")
        done += 1
    return done


def score_vot_cell(runtime, dataset, vot_ds, tag, out_dir, dataset_name,
                   eao_interval=None, log=print):
    """Score one VOT grid cell by EAO: run the reset-protocol tracker over
    every video writing trajectory files under <out_dir>/results, then
    EAO-score that result tree with the in-tree benchmark.

    vot_ds: eval.datasets.VOTDataset over the same sequences (provides gt
    trajectories, frame bounds and per-frame tags). eao_interval optionally
    overrides the dataset's (low, high) curve interval — the standard VOT2018
    window is frames 100..356, empty on short synthetic sequences."""
    from os.path import join

    from siammask_tpu.eval.benchmarks import EAOBenchmark
    from siammask_tpu.tracker.vot import track_vot

    traj_root = join(out_dir, "results")
    for video in dataset.values():
        track_vot(runtime, video, dataset=dataset_name, mask_enable=True,
                  result_dir=traj_root, tracker_name=tag, log=log)
    vot_ds.set_tracker(join(traj_root, dataset_name), [tag])
    bench = EAOBenchmark(vot_ds)
    if eao_interval is not None:
        bench.low, bench.high = eao_interval
    return bench.eval(tag)[tag]["all"]


def main():
    parser = argparse.ArgumentParser(description="Tune SiamMask-TPU tracker hp")
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--dataset", default="VOT2018")
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--out-dir", default="tune")
    parser.add_argument("--penalty-k", default="0.00,0.20,0.04")
    parser.add_argument("--window-influence", default="0.36,0.51,0.03")
    parser.add_argument("--lr", default="0.25,0.56,0.05")
    parser.add_argument("--search-region", default="255,256,16")
    parser.add_argument("--seg-thr", default="0.30,0.51,0.05",
                        help="used for VOS datasets")
    parser.add_argument("--eao-interval", default=None,
                        help="override the EAO curve interval as 'low,high' "
                             "(for short/synthetic sequences)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force the JAX backend")
    args = parser.parse_args()

    if args.platform:
        from siammask_tpu.parallel.mesh import force_platform
        force_platform(args.platform)

    from os.path import exists, join

    from siammask_tpu.config import Config
    from siammask_tpu.eval.datasets import load_dataset
    from siammask_tpu.tracker.runtime import TrackerRuntime
    from siammask_tpu.tracker.vos import track_vos
    from tools.test import build_model, load_variables

    def parse_range(s):
        lo, hi, step = map(float, s.split(","))
        return np.arange(lo, hi, step).round(4).tolist()

    vos = args.dataset.startswith("DAVIS") or args.dataset == "ytb_vos"
    grid = list(itertools.product(
        parse_range(args.penalty_k),
        parse_range(args.window_influence),
        parse_range(args.lr),
        [int(x) for x in parse_range(args.search_region)],
        parse_range(args.seg_thr) if vos else [None]))
    random.shuffle(grid)

    cfg = Config.load(args.config)
    model = build_model(cfg.arch, cfg.anchors.anchor_num)
    variables = load_variables(model, args.resume)
    dataset = load_dataset(args.dataset, args.data_dir)

    vot_ds = None
    if not vos:
        from siammask_tpu.data.gen_json import create_vot_json
        from siammask_tpu.eval.datasets import VOTDataset

        # the EAO scorer reads the toolkit json metadata; build it from the
        # raw sequence layout if absent (same builder tools/test.py uses)
        if not exists(join(args.data_dir, args.dataset + ".json")):
            create_vot_json(join(args.data_dir, args.dataset), args.dataset,
                            out_file=join(args.data_dir, args.dataset + ".json"))
        vot_ds = VOTDataset(args.dataset, args.data_dir)
    eao_interval = (tuple(int(x) for x in args.eao_interval.split(","))
                    if args.eao_interval else None)

    def tag_fn(cell):
        pk, wi, lr, instance, thr = cell
        return (f"pk{pk}_wi{wi}_lr{lr}_in{instance}"
                + (f"_thr{thr}" if vos else ""))

    def score_fn(cell):
        pk, wi, lr, instance, thr = cell
        hp = dict(cfg.hp)
        hp.update(penalty_k=pk, window_influence=wi, lr=lr,
                  instance_size=instance)
        if thr is not None:
            hp["seg_thr"] = thr
        p = cfg.tracker_config()
        p.update(hp)
        runtime = TrackerRuntime(model, variables, p, mask=True, refine=True)

        if vos:
            ious = []
            for video in dataset.values():
                iou, _ = track_vos(runtime, video,
                                   mot_enable=args.dataset != "DAVIS2016",
                                   log=lambda *_: None)
                if len(iou) > 0:
                    ious.append(np.mean(iou))
            return float(np.mean(ious))
        return score_vot_cell(runtime, dataset, vot_ds, tag_fn(cell),
                              args.out_dir, args.dataset,
                              eao_interval=eao_interval, log=lambda *_: None)

    run_grid(grid, args.out_dir, tag_fn, score_fn)


if __name__ == "__main__":
    main()
