"""Aggregate a jax.profiler trace into a device-time attribution table.

The profiling loop here is: run a bench with ``--profile-dir /tmp/trace``,
then ``python tools/trace_report.py /tmp/trace`` to see where device time
goes — per-fusion totals, grouped by op category (convolution fusions, layout
copies, elementwise fusions, collectives, infeed/outfeed), with percentages.
This is the tool behind the attribution numbers in README.md's performance
section (SURVEY §5.1: the reference has only wall-clock FPS prints; on TPU
the wall clock lies through the dispatch relay, so attribution must come
from device trace events).

Works on the trace.json(.gz) files jax.profiler writes under
``<dir>/plugins/profile/<ts>/``.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace_events(trace_dir: str) -> list:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
        + glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                    recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json(.gz) under {trace_dir}")
    path = paths[-1]  # newest profile run
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def device_pids(events) -> dict:
    """pid -> process name, for processes that look like device lanes."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    return {pid: n for pid, n in names.items()
            if re.search(r"TPU|/device|XLA Op|Chip", n, re.I)}


def op_lane_tids(events, pids) -> set:
    """(pid, tid) lanes carrying per-op events.

    Device traces put the outer program span on an "XLA Modules" thread and
    the per-op events on an "XLA Ops" thread of the same pid; summing both
    double-counts every op.  Keep only the op lanes when they exist.
    """
    lanes = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in pids
                and "xla ops" in e["args"].get("name", "").lower()):
            lanes.add((e["pid"], e["tid"]))
    return lanes


CATEGORIES = (
    ("convolution", r"conv|%conv"),
    ("matmul", r"dot|gemm|matmul"),
    ("layout copy", r"^copy|copy\.|transpose|bitcast-convert"),
    # NB: an XLA "fusion.N" can be a convolution fusion or an elementwise
    # one — the trace name alone doesn't say; cross-reference the HLO dump
    # when it matters which.
    ("fusion (conv+elementwise)", r"^(loop_)?fusion|^multiply|^add|^select"),
    ("reduce / pool", r"reduce|pool|maxpool"),
    ("gather / scatter / slice", r"gather|scatter|dynamic-slice|dynamic_slice|slice"),
    ("collective", r"all-reduce|all-gather|reduce-scatter|collective|psum"),
    ("infeed / outfeed / transfer", r"infeed|outfeed|transfer|h2d|d2h"),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in CATEGORIES:
        if re.search(pat, low):
            return cat
    return "other"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--top", type=int, default=20,
                        help="rows in the per-op table")
    parser.add_argument("--all-pids", action="store_true",
                        help="include host lanes, not just device ones")
    parser.add_argument("--long", action="store_true",
                        help="print each top op's HLO long_name + source")
    args = parser.parse_args()

    events = load_trace_events(args.trace_dir)
    pids = device_pids(events)
    if not pids and not args.all_pids:
        print("no device lanes recognized; rerun with --all-pids")
        args.all_pids = True

    # Collect complete events per (pid, tid) lane so nesting can be resolved:
    # XLA traces emit container spans (the `while` of a lax.scan, the outer
    # jit program) on the SAME lane as the per-op events they enclose, and a
    # naive sum double-counts everything under them.  Attribute each event
    # its SELF time: duration minus the time of events strictly nested
    # inside it on its lane.
    op_lanes = op_lane_tids(events, pids) if not args.all_pids else set()
    by_lane = collections.defaultdict(list)
    meta = {}  # name -> args dict of the first event seen (shared per op)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not args.all_pids and e.get("pid") not in pids:
            continue
        if op_lanes and (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        by_lane[(e.get("pid"), e.get("tid"))].append(
            (e["ts"], e["ts"] + e["dur"], e["name"], e["dur"]))
        if e["name"] not in meta and e.get("args"):
            meta[e["name"]] = e["args"]

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    for lane in by_lane.values():
        # Sort by start asc, end desc => parents come before their children.
        lane.sort(key=lambda ev: (ev[0], -ev[1]))
        stack = []  # (end, child_time_accum_index) — index into `self_time`
        self_time = []
        names = []
        for ts, te, name, dur in lane:
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                # this event's full span is the parent's child time
                self_time[stack[-1][1]] -= dur
            self_time.append(dur)
            names.append(name)
            stack.append((te, len(self_time) - 1))
        for name, st in zip(names, self_time):
            per_op[name] += max(st, 0)
            per_op_n[name] += 1

    total = sum(per_op.values())
    if total == 0:
        print("no complete events found")
        return

    # Prefer the profiler's own hlo_category (present in XLA:TPU traces;
    # distinguishes convolution fusions from loop fusions, which the bare op
    # name cannot) and fall back to name-pattern matching.
    per_cat = collections.Counter()
    per_src = collections.Counter()
    for name, dur in per_op.items():
        a = meta.get(name, {})
        per_cat[a.get("hlo_category") or categorize(name)] += dur
        src = a.get("source")
        if src:
            per_src["/".join(src.split("/")[-2:])] += dur

    print(f"device lanes: {sorted(pids.values()) or 'ALL'}")
    print(f"total device time: {total / 1e3:.3f} ms\n")
    print(f"{'category':<28}{'ms':>10}{'%':>8}")
    for cat, dur in per_cat.most_common():
        print(f"{cat:<28}{dur / 1e3:>10.3f}{100 * dur / total:>7.1f}%")
    if per_src:
        print(f"\n{'source line (top ' + str(args.top) + ')':<52}{'ms':>9}{'%':>7}")
        for src, dur in per_src.most_common(args.top):
            print(f"{src[-50:]:<52}{dur / 1e3:>9.3f}{100 * dur / total:>6.1f}%")

    print(f"\n{'op (top ' + str(args.top) + ')':<52}{'ms':>9}{'%':>7}{'calls':>8}")
    for name, dur in per_op.most_common(args.top):
        label = name if len(name) <= 50 else name[:47] + "..."
        print(f"{label:<52}{dur / 1e3:>9.3f}{100 * dur / total:>6.1f}%"
              f"{per_op_n[name]:>8}")
        a = meta.get(name, {})
        if args.long and a.get("long_name"):
            src = a.get("source", "")
            print(f"    {a['long_name'][:120]}")
            if src:
                print(f"    @ {src}")


if __name__ == "__main__":
    main()
