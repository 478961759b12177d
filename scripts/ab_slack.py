#!/usr/bin/env python
"""A/B the broadphase-cache slack on the real chip (traced scalar: one
compile, many values).  Measures both a fresh-fall state and a deeper
settled state.

  PIES_PROF_TETS=125000 python -u scripts/ab_slack.py
"""
import os
import sys
import time
from dataclasses import replace

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
    cell = s._broadphase_cell
    p0 = s.current_params()

    def timed(n, state, params):
        t0 = time.perf_counter()
        out, _ = tick_n(state, topo, params, cfg, n)
        _ = bool(out.sim_failed)
        return time.perf_counter() - t0, out

    _, st4 = timed(4, s._state, p0)
    _, st24 = timed(20, st4, p0)  # deeper-settled state

    for div in (32, 16, 8, 4):
        params = replace(p0, broadphase_slack=p0.broadphase_slack * 0 + cell / div)
        for label, state in (("fresh", s._state), ("settled24", st24)):
            t4, _ = timed(4, state, params)
            t8, _ = timed(8, state, params)
            print(
                f"slack=cell/{div:<3d} {label:10s} "
                f"per-tick={(t8 - t4) / 4 * 1e3:.1f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
