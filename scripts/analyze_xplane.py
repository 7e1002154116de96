#!/usr/bin/env python
"""Summarize a jax.profiler trace (trace.json.gz) of a tpugan step.

Aggregates the device "XLA Ops" line by op name and by category, divides
by the number of steps on the "Steps" line, and prints the top costs —
the per-op census BASELINE.md's step profiles quote.

    python scripts/analyze_xplane.py /tmp/prof_bf16 [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def categorize(name: str) -> str:
    n = name.lower()
    if n.startswith(("copy", "copy-start", "copy-done")) or ".copy" in n:
        return "copy/layout"
    if "conv" in n:
        return "convolution"
    if n.startswith("fusion") or re.match(r"^(loop_|input_|output_|scatter_)?fusion", n):
        return "fusion(elementwise/other)"
    if "dot" in n or "gemm" in n:
        return "matmul"
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n:
        return "collective"
    if n.startswith(("dynamic-update-slice", "dynamic-slice", "slice", "pad", "concatenate", "reverse", "transpose", "reshape", "bitcast", "broadcast")):
        return "data-movement"
    if n.startswith(("reduce", "reduce-window")):
        return "reduce"
    if "rng" in n:
        return "rng"
    if n.startswith(("infeed", "outfeed", "send", "recv")):
        return "host-io"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument(
        "--match",
        default=None,
        help="also report the aggregate cost of ops whose xprof metadata "
        "(tf_op/long_name, i.e. jax.named_scope path) contains this "
        "substring — e.g. --match pixel_shuffle",
    )
    args = ap.parse_args()

    paths = glob.glob(
        os.path.join(args.trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {args.trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]

    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev = [p for p, n in pids.items() if "TPU" in n]
    if not dev:
        raise SystemExit(f"no TPU device plane in {path} ({pids})")
    dev = dev[0]
    ops_tid = [t for (p, t), n in tids.items() if p == dev and n == "XLA Ops"]
    steps_tid = [t for (p, t), n in tids.items() if p == dev and n == "Steps"]
    if not ops_tid:
        raise SystemExit(
            f"no 'XLA Ops' thread on the TPU plane in {path} "
            f"(threads: {sorted(n for (p, _), n in tids.items() if p == dev)})"
        )
    ops_tid = ops_tid[0]
    steps_tid = steps_tid[0] if steps_tid else None

    steps = [
        e for e in ev if e.get("ph") == "X" and e["pid"] == dev and e["tid"] == steps_tid
    ]
    if steps_tid is None or not steps:
        print("NOTE: no 'Steps' line in this trace — totals below are "
              "per-TRACE, not per-step (step time/gaps unavailable).")
    n_steps = max(len(steps), 1)
    step_ms = sum(e.get("dur", 0) for e in steps) / n_steps / 1e3

    by_name = collections.Counter()
    n_by_name = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    n_ops = 0
    match_dur = 0.0
    match_n = 0
    match_names = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e["pid"] != dev or e["tid"] != ops_tid:
            continue
        dur = e.get("dur", 0)
        name = e["name"]
        by_name[name] += dur
        n_by_name[name] += 1
        by_cat[categorize(name)] += dur
        total += dur
        n_ops += 1
        if args.match:
            a = e.get("args", {})
            meta = " ".join(
                str(a.get(k, "")) for k in ("tf_op", "long_name", "name")
            ) + " " + name
            if args.match in meta:
                match_dur += dur
                match_n += 1
                match_names[name] += dur

    print(f"trace: {path}")
    if steps:
        print(f"steps: {n_steps}  step time: {step_ms:.2f} ms  "
              f"ops/step: {n_ops // n_steps}")
        print(f"device busy (ops line): {total / n_steps / 1e3:.2f} ms/step "
              f"(gaps: {step_ms - total / n_steps / 1e3:.2f} ms)")
    else:
        print(f"ops (whole trace): {n_ops}  device busy: {total / 1e3:.2f} ms")
    print("\nby category (ms/step):")
    for cat, dur in by_cat.most_common():
        print(f"  {cat:28s} {dur / n_steps / 1e3:8.2f}  ({dur / total * 100:5.1f}%)")
    print(f"\ntop {args.top} ops (ms/step, count/step):")
    for name, dur in by_name.most_common(args.top):
        print(
            f"  {dur / n_steps / 1e3:7.3f}  x{n_by_name[name] // n_steps:<4d} {name[:90]}"
        )
    if args.match:
        print(
            f"\nops matching '{args.match}': {match_n // n_steps}/step, "
            f"{match_dur / n_steps / 1e3:.3f} ms/step "
            f"({match_dur / total * 100:.2f}% of device busy)"
        )
        for name, dur in match_names.most_common(10):
            print(f"  {dur / n_steps / 1e3:7.3f}  {name[:90]}")


if __name__ == "__main__":
    main()
