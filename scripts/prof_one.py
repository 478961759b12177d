#!/usr/bin/env python
"""Time one tick variant on the real chip (one compile per invocation).

  python scripts/prof_one.py <variant> [n_tets] [settle]

Variants: tick | detect | nocoll | cg1 | iters1 | stab0 | full | rtol
Appends a line to /tmp/prof_results.txt so partial progress survives kills.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    variant = sys.argv[1]
    n_tets = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    settle = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    reps = int(os.environ.get("PIES_PROF_REPS", 5))

    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver.step import tick, default_detect_collisions

    def make(mode="recentered", iterations=4, stab=4, **kw):
        kw.setdefault("enable_collisions", True)
        s = Solver(
            SolverOptions(
                solver=SolverName.PD,
                iterations=iterations,
                collision_stabilization_iterations=stab,
            ),
            contact_coupling=mode,
            **kw,
        )
        s.create_tet_soup(
            n_tets, spacing=1.6, scale=0.8, w=2000.0, height=0.5, jitter=0.05
        )
        s._prepare()
        return s

    # Settle with the variant's own program where possible to avoid a second
    # compile; for non-tick variants settle with the default program.
    cfgs = {
        "tick": dict(),
        "full": dict(mode="full"),
        "nocoll": dict(enable_collisions=False),
        "cg1": dict(cg_iterations=1),
        "rtol": dict(cg_rtol=1e-3),
        "iters1": dict(iterations=1),
        "stab0": dict(stab=0),
        "detect": dict(),
    }[variant]
    try:
        s = make(**cfgs)
    except Exception as e:  # wedged-tunnel retry
        if "UNAVAILABLE" in str(e):
            s = make(**cfgs)
        else:
            raise
    params = s.current_params()
    for _ in range(settle):
        s.tick()
    state = s._state

    if variant == "detect":
        @partial(jax.jit, static_argnames=("config",))
        def detect(state, topo, params, config):
            c = default_detect_collisions(
                state, state.positions, topo, params, config
            )
            return c.pt_mask.sum(), c.overflow

        fn = partial(detect, config=s._config)
        nhits, _ = fn(state, s._topology, params)
        extra = f" live_contacts={int(nhits)}"
    else:
        fn = partial(tick, config=s._config)
        extra = ""

    out = fn(state, s._topology, params)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(state, s._topology, params)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    line = f"{variant:8s} tets={n_tets} {1e3*dt:10.2f} ms{extra}"
    print(line)
    with open("/tmp/prof_results.txt", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
