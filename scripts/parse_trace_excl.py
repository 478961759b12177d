#!/usr/bin/env python
"""Exclusive-time aggregation of an XLA device trace.

trace_tick.py's table sums every device event, so control-flow wrappers
(cond/while) are counted once for themselves and once for every leaf they
contain — at mixed-scene scale the wrapper rows dominated the table and
hid the real costs.  This parser recovers EXCLUSIVE ms per op: events on
one device lane are sorted by start time and nested by interval
containment; a parent's exclusive time is its duration minus its direct
children's.

  python scripts/parse_trace_excl.py /tmp/pies_trace_mx [n_ticks]
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("no trace files under", trace_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    lane_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            lane_names[(ev.get("pid"), ev.get("tid"))] = ev["args"].get(
                "name", ""
            )

    per_lane = defaultdict(list)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        lane = lane_names.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" not in lane and "Steps" not in lane and "TensorFlow Op" not in lane:
            if "TPU" not in lane or "pjrt" in lane.lower():
                continue
        per_lane[(ev.get("pid"), ev.get("tid"))].append(ev)

    excl = defaultdict(float)
    total = 0.0
    span = 0.0
    for lane, evs in per_lane.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        span += (
            max(e["ts"] + e.get("dur", 0) for e in evs) - evs[0]["ts"]
        ) / 1000.0
        stack = []  # (end_ts, name, consumed_by_children)
        for ev in evs:
            ts, dur = ev["ts"], ev.get("dur", 0)
            name = ev.get("name", "")
            while stack and stack[-1][0] <= ts:
                end, nm, consumed, d = stack.pop()
                excl[nm] += (d - consumed) / 1000.0
            if stack:
                # direct parent absorbs this child's duration
                stack[-1][2] += dur
            else:
                total += dur / 1000.0
            stack.append([ts + dur, name, 0, dur])
        while stack:
            end, nm, consumed, d = stack.pop()
            excl[nm] += (d - consumed) / 1000.0
    # Device idle between TOP-LEVEL events (un-parented gaps): the drain/
    # refill cost of control-flow boundaries lives here when the wrapper
    # op's own event does not cover its region.
    excl["<top-level gaps>"] = span - total

    # HLO long-name (op + operand shapes) from trace args.
    src = {}
    for ev in events:
        if ev.get("ph") == "X" and "args" in ev:
            ln = ev["args"].get("long_name")
            if ln:
                m = re.match(r"%?\S+ = (.*)", ln)
                src[ev["name"]] = m.group(1)[:140] if m else ln[:140]

    rows = sorted(excl.items(), key=lambda kv: -kv[1])
    print(f"device busy: {total / n_ticks:.2f} ms/tick; span incl. gaps: "
          f"{span / n_ticks:.2f} ms/tick")
    print(f"{'ms/tick':>9}  {'%':>5}  op  [src]")
    tot_excl = sum(excl.values())
    for name, ms in rows[:55]:
        print(
            f"{ms / n_ticks:9.3f}  {100 * ms / max(tot_excl, 1e-9):5.1f}  "
            f"{name[:52]:52s}  {src.get(name, '')[:60]}"
        )


if __name__ == "__main__":
    main()
