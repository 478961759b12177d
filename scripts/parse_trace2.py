#!/usr/bin/env python
"""Re-aggregate an existing /tmp/pies_trace profile: leaf ops only (no
while/cond/call wrappers, which double-count their bodies), grouped by
HLO source line.  Usage: python scripts/parse_trace2.py [n_ticks]."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 4
trace_dir = os.environ.get("PIES_TRACE_DIR", "/tmp/pies_trace")

files = sorted(
    glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
    key=os.path.getmtime,
)
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)
events = trace.get("traceEvents", [])

lane_names = {}
for ev in events:
    if ev.get("ph") == "M" and ev.get("name") == "thread_name":
        lane_names[(ev.get("pid"), ev.get("tid"))] = ev["args"].get("name", "")

per_src = defaultdict(float)
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
    base = name.split(":")[-1].lstrip("%")
    if base.split(".")[0] in ("while", "cond", "call", "closed_call"):
        continue
    dur = ev.get("dur", 0) / 1000.0
    args = ev.get("args", {}) or {}
    # tf_op / source info when present
    src = args.get("source_info") or args.get("tf_op") or ""
    per_op[(name, src)] += dur
    total += dur

print(f"leaf total {total:.1f} ms over {n_ticks} ticks ({total/n_ticks:.2f} ms/tick)\n")
rows = sorted(per_op.items(), key=lambda kv: -kv[1])
print(f"{'ms/tick':>9}  op / src")
for (name, src), ms in rows[:80]:
    print(f"{ms/n_ticks:9.3f}  {name[:60]}  {src[:70]}")
