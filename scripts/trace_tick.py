#!/usr/bin/env python
"""HLO-attributed trace of the stress tick: per-op ms that SUM to the tick.

Protocol (see PLAN.md *Measurement protocol*): wrap ONE warm `tick_n` in
`jax.profiler.trace`, parse the resulting .trace.json.gz device events,
aggregate by op name, and map op names to python source lines via the
compiled HLO's `metadata={... source_file source_line}`.

  PIES_PROF_TETS=125000 PIES_PROF_N=4 python -u scripts/trace_tick.py
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    n_tets = int(os.environ.get("PIES_PROF_TETS", 125_000))
    n_ticks = int(os.environ.get("PIES_PROF_N", 4))
    settle = int(os.environ.get("PIES_PROF_SETTLE", 10))
    trace_dir = os.environ.get("PIES_TRACE_DIR", "/tmp/pies_trace")

    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver.step import tick_n

    scene = os.environ.get("PIES_TRACE_SCENE", "soup")
    if scene == "cloth":
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        s.create_sheet((0.0, 10.0, 0.0), 1.0, 1.0, 5000.0)
    elif scene == "pile":
        import numpy as np

        npts = int(os.environ.get("PIES_PROF_NODES", 8192))
        rng = np.random.default_rng(3)
        pts = rng.uniform(
            [-4, 0.5, -4], [4, 6.0, 4], (npts, 3)
        ).astype(np.float32)
        s = Solver(SolverOptions(solver=SolverName.PBD), enable_collisions=True)
        s.add_nodes(pts)
    elif scene == "blobs":
        import numpy as np

        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        side = 8
        for b in range(64):
            i, j = divmod(b, side)
            s.create_shape_matching_box(
                (3.0 * i, 1.0 + 0.5 * (b % 3), 3.0 * j), 5, 5, 5, 1.0,
                (0.0, 0.0, 0.0), 4000.0,
            )
    elif scene == "mixed":
        import numpy as np

        n_tets_mix = int(os.environ.get("PIES_PROF_TETS", 12_500))
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        s.create_tet_soup(n_tets_mix, spacing=1.6, scale=0.8, w=2000.0,
                          height=0.5, jitter=0.05)
        side = int(np.ceil((n_tets_mix * 1.6 ** 3) ** (1 / 3)))
        sheet_n = 48
        sx = np.linspace(-side * 0.4, side * 0.4, sheet_n, dtype=np.float32)
        gx, gz = np.meshgrid(sx, sx, indexing="ij")
        pts = np.stack([gx, np.full_like(gx, 3.2), gz], -1).reshape(-1, 3)
        ids = s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.25)
        g = ids.reshape(sheet_n, sheet_n)
        pairs = np.concatenate([
            np.stack([g[:-1, :].ravel(), g[1:, :].ravel()], 1),
            np.stack([g[:, :-1].ravel(), g[:, 1:].ravel()], 1),
            np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel()], 1),
        ])
        s._builder._emit_distance(pairs, 4000.0)
        tris = np.concatenate([
            np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(),
                      g[1:, 1:].ravel()], 1),
            np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(),
                      g[:-1, 1:].ravel()], 1),
        ])
        s._builder._emit_triangles(tris)
        s._dirty = True
    elif scene == "mesh100k":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from prof_mesh import load_mesh_txt

        points, tets_a, surface = load_mesh_txt(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "refbench", "tet_cube_mesh_100k.txt",
        ))
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        ids = s._builder._emit_nodes(points, inv_mass=1.0, radius=0.2)
        s._builder._emit_tets(ids[tets_a], 1000.0)
        s._builder._emit_triangles(ids[surface])
        s._dirty = True
    else:
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
    s._prepare()
    if settle:
        s.run_ticks(settle)
    params = s.current_params()

    # Warm compile at the same n so the traced call is execution only.
    s.run_ticks(n_ticks)
    print("live contacts this state:", flush=True)

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        s.run_ticks(n_ticks)

    # --- source attribution: op name -> source_file:source_line ---
    lowered = jax.jit(tick_n, static_argnames=("config", "n")).lower(
        s.state, s.topology, params, s._config, n_ticks
    )
    hlo = lowered.compile().as_text()
    src_of = {}
    pat = re.compile(
        r"%?([\w.\-]+) = [^\n]*metadata=\{[^}]*op_name=\"([^\"]*)\""
        r"[^}]*source_file=\"([^\"]*)\"[^}]*source_line=(\d+)"
    )
    for m in pat.finditer(hlo):
        src_of[m.group(1)] = (
            m.group(2),
            m.group(3).split("/")[-1],
            int(m.group(4)),
        )

    # --- parse device events ---
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("no trace files found under", trace_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Device-lane complete events: pid/tid whose thread name mentions TensorFlow
    # Op stream or XLA Ops.  Keep it simple: aggregate X events by name,
    # excluding python-side lanes (those carry 'tf_op' rarely); device lanes
    # have 'dur' in us and names matching HLO ops (e.g. 'fusion.123').
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
            # fall back: device lanes on TPU traces are usually '/device:TPU:0 ...'
            if "TPU" not in lane or "pjrt" in lane.lower():
                continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1000.0  # us -> ms
        per_op[name] += dur
        total += dur

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\ntotal device time {total:.1f} ms over {n_ticks} ticks "
          f"({total / max(n_ticks, 1):.1f} ms/tick)\n")
    print(f"{'ms/tick':>9}  {'%':>5}  op  [src]")
    for name, ms in rows[:60]:
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
