#!/usr/bin/env python
"""Dispatch-independent tick timing: time tick_n at two batch sizes and
report the difference — tunnel dispatch/sync costs cancel exactly.

  PIES_PROF_TETS=125000 python -u scripts/truebench.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    n_tets = int(os.environ.get("PIES_PROF_TETS", 125_000))
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver.step import tick_n

    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True,
               contact_coupling=os.environ.get("PIES_COUPLING", "recentered"))
    s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
    s._prepare()
    params = s.current_params()
    st, topo, cfg = s._state, s._topology, s._config

    def timed(n, state):
        t0 = time.perf_counter()
        out, res = tick_n(state, topo, params, cfg, n)
        _ = bool(out.sim_failed)  # value fetch = real sync
        return time.perf_counter() - t0, out

    # compile both sizes
    _, st4 = timed(4, st)
    _, _ = timed(8, st)
    for label, state in (("fresh (falling)", st), ("settled-ish", st4)):
        t4, _ = timed(4, state)
        t8, _ = timed(8, state)
        print(f"{label:20s} t4={t4:.3f}s t8={t8:.3f}s per-tick={(t8-t4)/4*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
