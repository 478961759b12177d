#!/usr/bin/env python
"""A/B the per-dispatch tunnel overhead: tick_n with (state, topo, params)
as arguments vs a jit that closes over topo/params (constant device buffers
baked into the executable).  If the ~27 ms/dispatch scales with argument
leaf count, the closed form should cut most of it — at 10-tick batches
that is ~18% of the committed headline metric.

  PIES_AB_TETS=125000 python -u scripts/ab_dispatch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_tets = int(os.environ.get("PIES_AB_TETS", 125_000))
    n = int(os.environ.get("PIES_AB_N", 10))

    import jax

    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver.step import tick

    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_tet_soup(n_tets, spacing=1.6, scale=0.8, w=2000.0, height=0.5,
                      jitter=0.05)
    s._prepare()
    params = s.current_params()
    topo = s._topology
    config = s._config
    state0 = s._state

    leaves = len(jax.tree_util.tree_leaves((state0, topo, params)))
    print(f"arg leaves (state+topo+params): {leaves}")

    def timed(fn, state, label, reps=3):
        out = fn(state)
        _ = bool(out[0].sim_failed)
        best = 1e9
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(state)
            _ = bool(out[0].sim_failed)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {1000 * best / n:.2f} ms/tick ({1000 * best:.1f} ms / {n} ticks)")
        return best

    # A: the production path (state+topo+params as args).
    def run_args(state):
        from pies_tpu.solver.step import tick_n
        return tick_n(state, topo, params, config, n)

    # B: topo/params closed over — only the state crosses the dispatch.
    @jax.jit
    def tick_n_closed(state):
        def body(st, _):
            s2, res = tick(st, topo, params, config)
            return s2, res

        state, residuals = jax.lax.scan(body, state, None, length=n)
        return state, residuals[-1]

    ta = timed(run_args, state0, "args   ")
    tb = timed(tick_n_closed, state0, "closed ")
    print(f"per-dispatch delta: {1000 * (ta - tb):.1f} ms")


if __name__ == "__main__":
    main()
