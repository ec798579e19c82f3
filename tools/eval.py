"""Offline evaluation over written result dirs: VOT EAO / Accuracy /
Robustness, DAVIS J&F (region similarity + boundary accuracy), and
YouTube-VOS J_s/J_u/F_s/F_u (seen/unseen category split).

Mirrors the reference `tools/eval.py` for VOT (glob tracker result dirs by
prefix, score AR then EAO, pretty table, process-pool fan-out over trackers);
the DAVIS and ytb_vos paths evaluate the fused masks `tools/test.py
--save_mask` writes — the reference had no local evaluator for either (its
README J/F numbers came from the external DAVIS toolkit / codalab server).
"""
import argparse
import sys
from glob import glob
from multiprocessing import Pool
from os.path import basename, dirname, isdir, join, realpath

sys.path.insert(0, dirname(dirname(realpath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Evaluate VOT results")
    parser.add_argument("--dataset", default="VOT2018")
    parser.add_argument("--dataset-dir", default="data",
                        help="dir containing <dataset>.json metadata")
    parser.add_argument("--result-dir", default="test")
    parser.add_argument("--tracker-prefix", default="",
                        help="filter tracker result dirs by prefix")
    parser.add_argument("--num", type=int, default=4, help="process pool size")
    args = parser.parse_args()

    from siammask_tpu.eval.benchmarks import (AccuracyRobustnessBenchmark,
                                              EAOBenchmark)
    from siammask_tpu.eval.datasets import VOTDataset

    tracker_root = join(args.result_dir, args.dataset)
    trackers = sorted(basename(x) for x in glob(join(tracker_root,
                                                     args.tracker_prefix + "*"))
                      if isdir(x))
    if not trackers:
        print(f"no tracker results under {tracker_root}")
        return

    if args.dataset.startswith("DAVIS"):
        from siammask_tpu.eval.datasets import load_dataset
        from siammask_tpu.eval.davis import DAVISBenchmark

        bench = DAVISBenchmark(load_dataset(args.dataset, args.dataset_dir),
                               args.dataset, args.result_dir)
        results = {}
        if args.num > 1 and len(trackers) > 1:
            with Pool(min(args.num, len(trackers))) as pool:
                for r in pool.imap_unordered(bench.eval, trackers):
                    results.update(r)
        else:
            for t in trackers:
                results.update(bench.eval(t))
        summary = DAVISBenchmark.summarize(results)
        name_len = max(max(len(t) for t in trackers) + 2, 12)
        header = (f"|{'Tracker Name':^{name_len}}|{'J-mean':^8}|{'J-recall':^10}|"
                  f"{'J-decay':^9}|{'F-mean':^8}|{'F-recall':^10}|{'F-decay':^9}|")
        bar = "-" * len(header)
        print(bar + "\n" + header + "\n" + bar)
        for name in sorted(trackers, key=lambda t: -summary[t]["J_mean"]):
            s = summary[name]
            print(f"|{name:^{name_len}}|{s['J_mean']:^8.3f}|{s['J_recall']:^10.3f}|"
                  f"{s['J_decay']:^9.3f}|{s['F_mean']:^8.3f}|"
                  f"{s['F_recall']:^10.3f}|{s['F_decay']:^9.3f}|")
        print(bar)
        return

    if args.dataset == "ytb_vos":
        from siammask_tpu.eval.datasets import load_dataset
        from siammask_tpu.eval.ytb_vos import YTBVOSBenchmark

        bench = YTBVOSBenchmark(load_dataset("ytb_vos", args.dataset_dir),
                                args.result_dir, args.dataset,
                                data_dir=args.dataset_dir)
        results = {}
        if args.num > 1 and len(trackers) > 1:
            with Pool(min(args.num, len(trackers))) as pool:
                for r in pool.imap_unordered(bench.eval, trackers):
                    results.update(r)
        else:
            for t in trackers:
                results.update(bench.eval(t))
        summary = bench.summarize(results)
        name_len = max(max(len(t) for t in trackers) + 2, 12)
        header = (f"|{'Tracker Name':^{name_len}}|{'J_seen':^8}|{'J_unseen':^10}|"
                  f"{'F_seen':^8}|{'F_unseen':^10}|{'Overall':^9}|")
        bar = "-" * len(header)
        print(bar + "\n" + header + "\n" + bar)
        for name in sorted(trackers, key=lambda t: -summary[t]["overall"]):
            s = summary[name]
            print(f"|{name:^{name_len}}|{s['J_seen']:^8.3f}|"
                  f"{s['J_unseen']:^10.3f}|{s['F_seen']:^8.3f}|"
                  f"{s['F_unseen']:^10.3f}|{s['overall']:^9.3f}|")
        print(bar)
        return

    dataset = VOTDataset(args.dataset, args.dataset_dir)
    dataset.set_tracker(tracker_root, trackers)

    ar = AccuracyRobustnessBenchmark(dataset)
    eao = EAOBenchmark(dataset)

    if args.num > 1 and len(trackers) > 1:
        with Pool(min(args.num, len(trackers))) as pool:
            ar_results = {}
            for r in pool.imap_unordered(ar.eval, trackers):
                ar_results.update(r)
            eao_results = {}
            for r in pool.imap_unordered(eao.eval, trackers):
                eao_results.update(r)
    else:
        ar_results = ar.eval(trackers)
        eao_results = eao.eval(trackers)

    summary = AccuracyRobustnessBenchmark.summarize(ar_results)
    name_len = max(max(len(t) for t in trackers) + 2, 12)
    header = (f"|{'Tracker Name':^{name_len}}|{'Accuracy':^10}|"
              f"{'Robustness':^12}|{'Lost Number':^13}|{'EAO':^7}|")
    bar = "-" * len(header)
    print(bar)
    print(header)
    print(bar)
    for name in sorted(trackers, key=lambda t: -eao_results[t]["all"]):
        s = summary[name]
        print(f"|{name:^{name_len}}|{s['accuracy']:^10.3f}|"
              f"{s['robustness']:^12.3f}|{s['lost_number']:^13.1f}|"
              f"{eao_results[name]['all']:^7.3f}|")
    print(bar)


if __name__ == "__main__":
    main()
