#!/usr/bin/env python
"""A/B the broadphase cell size on the real chip.

``broadphase_cell`` is a *traced* PhysicsParams scalar, so every scale
shares one compiled executable — the sweep isolates the physical effect:
bigger cells shrink the query window (fewer bucket lookups) but raise
per-cell occupancy (more candidates per query).

  PIES_PROF_TETS=125000 python -u scripts/ab_cell_scale.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_tets = int(os.environ.get("PIES_PROF_TETS", 125_000))
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver.step import tick_n

    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
    s._prepare()
    topo, cfg = s._topology, s._config
    base_cell = s._broadphase_cell

    def timed(n, state, params):
        t0 = time.perf_counter()
        out, _ = tick_n(state, topo, params, cfg, n)
        _ = bool(out.sim_failed)
        return time.perf_counter() - t0, out

    # settle 4 ticks at the default cell first
    p0 = s.current_params()
    _, st = timed(4, s._state, p0)

    from dataclasses import replace

    for mult in (0.75, 1.0, 1.25, 1.5, 2.0):
        cell = base_cell * mult
        params = replace(p0, broadphase_cell=p0.broadphase_cell * mult)
        t4, _ = timed(4, st, params)
        t8, _ = timed(8, st, params)
        print(
            f"cell={cell:.2f} ({mult:.2f}x of default) "
            f"per-tick={(t8 - t4) / 4 * 1e3:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
