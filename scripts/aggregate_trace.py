"""Aggregate a jax.profiler trace by XLA hlo_category.

The tensorboard profile plugin in this image is version-broken against
TF, but the Chrome-trace export written by ``jax.profiler.trace``
carries the same per-HLO timings and ``hlo_category`` args.  This sums
device-track event durations per category — the table behind
docs/ROOFLINE.md.

Usage:
    python scripts/aggregate_trace.py /tmp/trace [n_steps]

``n_steps`` (default 1) divides totals into per-step ms; pass the number
of steps captured inside the trace block.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def load_trace(trace_dir):
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    data = load_trace(trace_dir)
    events = data["traceEvents"]

    # device tracks: pid whose process_name mentions TPU/device XLA ops.
    # The host python/runtime tracks carry no hlo_category; filtering on
    # the arg's presence is enough in practice.
    by_cat = defaultdict(float)
    by_name = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None:
            continue
        dur_ms = e.get("dur", 0) / 1e3
        by_cat[cat] += dur_ms
        by_name[(cat, e.get("name", "?"))] += dur_ms

    total = sum(by_cat.values())
    print(f"device HLO time: {total / n_steps:.2f} ms/step "
          f"({total:.1f} ms over {n_steps} steps)\n")
    print(f"{'category':<40} {'ms/step':>9} {'share':>7}")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<40} {ms / n_steps:9.2f} {ms / total * 100:6.1f}%")

    print("\ntop 15 ops:")
    for (cat, name), ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms / n_steps:8.3f} ms  [{cat}] {name[:90]}")


if __name__ == "__main__":
    main()
