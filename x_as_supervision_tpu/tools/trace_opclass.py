"""Aggregate a jax.profiler trace by XLA hlo_category, optionally diffing
two traces — the PERF.md op-class tables.

Reads the Perfetto-format `*.trace.json.gz` a `jax.profiler.start_trace`
capture writes (no tensorflow dependency), restricts to the device's
"XLA Ops" track, and sums durations per `hlo_category` (and per op name
for the diff). Durations are divided by --steps (the number of train
steps inside the capture window).

Usage:
  python -m x_as_supervision_tpu.tools.trace_opclass DIR [DIR2] --steps 3
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json


def load_ops(trace_dir: str):
    """All complete events on the device's 'XLA Ops' track."""
    files = sorted(
        glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    ops_track = None
    for e in events:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e["args"]["name"] == "XLA Ops"
        ):
            ops_track = (e["pid"], e["tid"])
    return [
        e
        for e in events
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) == ops_track
    ]


def by_category(ops, steps: int):
    cats = collections.defaultdict(float)
    for e in ops:
        cats[(e.get("args") or {}).get("hlo_category", "?")] += (
            e.get("dur", 0.0) / 1e3 / steps
        )
    return dict(cats)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+", help="1 or 2 trace directories")
    p.add_argument("--steps", type=int, default=3,
                   help="train steps inside the capture window")
    args = p.parse_args()

    tables = {}
    for d in args.dirs:
        cats = by_category(load_ops(d), args.steps)
        tables[d] = cats
        print(f"== {d}  total {sum(cats.values()):.1f} ms/step")
        for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
            if v >= 0.05:
                print(f"  {k:32s} {v:8.2f} ms/step")

    if len(args.dirs) == 2:
        a, b = (tables[d] for d in args.dirs)
        print("\n== category deltas (second - first, ms/step)")
        for k in sorted(set(a) | set(b), key=lambda k: -(
            abs(b.get(k, 0.0) - a.get(k, 0.0))
        )):
            d = b.get(k, 0.0) - a.get(k, 0.0)
            if abs(d) >= 0.05:
                print(f"  {d:+8.2f}  {k}")


if __name__ == "__main__":
    main()
