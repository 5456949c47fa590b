"""Aggregate a jax.profiler xplane trace into per-HLO-op device time.

The tensorboard profile plugin's native converter is incompatible with
the installed TF build, so this parses the xplane.pb directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2) and aggregates event
durations by op name on the TPU device plane — the SURVEY §5.1
per-kernel attribution the round-3 perf work drives from.

Usage: python tools/trace_ops.py TRACE_DIR_OR_PB [--top N] [--group]
  --group  collapse fusion names to their root (loop_fusion.123 ->
           fusion) and show category totals first
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path


def find_pb(path: str) -> str:
    p = Path(path)
    if p.is_file():
        return str(p)
    cands = sorted(p.rglob("*.xplane.pb"))
    if not cands:
        sys.exit(f"no xplane.pb under {path}")
    return str(cands[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--like", default="")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(find_pb(args.path), "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        ev_names = dict(plane.event_metadata)
        tot = defaultdict(float)
        cnt = defaultdict(int)
        all_time = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module lines
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps / 1e9  # ms
                tot[name] += dur
                cnt[name] += 1
                all_time += dur
        if not tot:
            continue
        print(f"== plane: {plane.name}  lines={len(plane.lines)} "
              f"total={all_time:.1f} ms (all lines summed; nesting "
              f"may double-count)")
        # category grouping: op kind (+ output shape) from the HLO text
        cats = defaultdict(float)
        for k, v in tot.items():
            head = k.split(" = ", 1)
            kind = re.sub(r"^%?", "", re.sub(r"[.\d]+$", "", head[0]))
            shape = ""
            if len(head) > 1:
                m = re.match(r"\(?([a-z0-9]+\[[0-9,]*\])", head[1])
                shape = m.group(1) if m else ""
            cats[f"{kind} {shape}"] += v
        print("-- by op root --")
        for k, v in sorted(cats.items(), key=lambda x: -x[1])[:args.top]:
            print(f"{v:10.1f} ms  {k}")
        print("-- top individual ops --")
        items = sorted(tot.items(), key=lambda x: -x[1])
        for k, v in items[:args.top]:
            if args.like and args.like not in k:
                continue
            print(f"{v:10.1f} ms  x{cnt[k]:<5d} {k[:110]}")


if __name__ == "__main__":
    main()
