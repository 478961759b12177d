#!/usr/bin/env python
"""Dump the compiled HLO text of the stress tick_n program for source
attribution (consumed by scripts/parse_trace.py via PIES_HLO_TXT).

  PIES_PROF_TETS=125000 PIES_PROF_N=4 python scripts/dump_hlo.py /tmp/tick.hlo
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tick.hlo"
    n_tets = int(os.environ.get("PIES_PROF_TETS", 125_000))
    n_ticks = int(os.environ.get("PIES_PROF_N", 4))

    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver.step import tick_n

    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
    s._prepare()
    params = s.current_params()
    lowered = jax.jit(tick_n, static_argnames=("config", "n")).lower(
        s.state, s.topology, params, s._config, n_ticks
    )
    txt = lowered.compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")


if __name__ == "__main__":
    main()
