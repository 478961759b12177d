#!/usr/bin/env python
"""Standalone mixed_cloth_over_soup measurement (bench_all config 4c) with
budget knobs, for bisecting the round-4 1.79M-vs-866k tri-ticks/s
contradiction (VERDICT r4 #2/#3).

  python scripts/bench_mixed.py [nbw] [bmax]

nbw = max_narrow_bodies, bmax = max_candidates_per_body; 0 = keep the
host's super-path defaults (64 / 512).  Appends to /tmp/bench_mixed.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    nbw = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    bmax = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    ticks = int(os.environ.get("PIES_TICKS", 40))

    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions

    overrides = {}
    if nbw:
        overrides["max_narrow_bodies"] = nbw
    if bmax:
        overrides["max_candidates_per_body"] = bmax

    n_tets_mix = 12_500
    s = Solver(
        SolverOptions(solver=SolverName.PD),
        enable_collisions=True,
        budget_overrides=overrides or None,
    )
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
        np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(), g[1:, 1:].ravel()], 1),
        np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(), g[:-1, 1:].ravel()], 1),
    ])
    s._builder._emit_triangles(tris)
    s._dirty = True
    s._prepare()
    b = s._config.budget
    n_tris = int(np.concatenate(s._builder.triangles).shape[0])

    settle = int(os.environ.get("PIES_SETTLE", 0))
    s.run_ticks(ticks)
    assert not s.sim_failed, "warmup latched"
    for _ in range(settle // ticks):
        s.run_ticks(ticks)
    t0 = time.perf_counter()
    s.run_ticks(ticks)
    dt = time.perf_counter() - t0
    assert not s.sim_failed, "timing latched"
    sps = ticks / dt
    line = (
        f"mixed nbw={b.max_narrow_bodies} bmax={b.max_candidates_per_body} "
        f"settle={settle} "
        f"{1000*dt/ticks:8.2f} ms/tick  {sps*n_tris/1e6:6.3f}M tri-ticks/s"
    )
    print(line)
    with open("/tmp/bench_mixed.txt", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
