#!/usr/bin/env python
"""Parse an existing jax.profiler trace dir: per-op ms aggregated by name.

Optionally attribute ops to source lines using a cached HLO text dump
(PIES_HLO_TXT) produced by scripts/dump_hlo.py.

  PIES_PROF_N=4 python scripts/parse_trace.py /tmp/pies_trace
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pies_trace"
    n_ticks = int(os.environ.get("PIES_PROF_N", 4))
    hlo_txt = os.environ.get("PIES_HLO_TXT", "")

    src_of = {}
    if hlo_txt and os.path.exists(hlo_txt):
        pat = re.compile(
            r"%?([\w.\-]+) = [^\n]*metadata=\{[^}]*op_name=\"([^\"]*)\""
            r"[^}]*source_file=\"([^\"]*)\"[^}]*source_line=(\d+)"
        )
        with open(hlo_txt) as f:
            for m in pat.finditer(f.read()):
                src_of[m.group(1)] = (
                    m.group(2), m.group(3).split("/")[-1], int(m.group(4))
                )

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("no trace files under", trace_dir)
        return
    print("parsing", files[-1])
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    lane_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            lane_names[(ev.get("pid"), ev.get("tid"))] = ev["args"].get("name", "")

    per_op = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        lane = lane_names.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" not in lane and "Steps" not in lane and "TensorFlow Op" not in lane:
            if "TPU" not in lane or "pjrt" in lane.lower():
                continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1000.0
        per_op[name] += dur
        total += dur

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\ntotal device time {total:.1f} ms over {n_ticks} ticks "
          f"({total / max(n_ticks, 1):.1f} ms/tick)\n")
    print(f"{'ms/tick':>9}  {'%':>5}  op  [src]")
    for name, ms in rows[:70]:
        base = name.split(":")[-1]
        src = src_of.get(base) or src_of.get(base.lstrip("%"))
        tag = ""
        if src:
            op_name, fname, line = src
            short = "/".join(op_name.split("/")[-2:])
            tag = f"{fname}:{line}  {short[:70]}"
        print(
            f"{ms / max(n_ticks, 1):9.3f}  {100 * ms / max(total, 1e-9):5.1f}  "
            f"{name[:46]:46s}  {tag}"
        )


if __name__ == "__main__":
    main()
