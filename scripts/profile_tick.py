#!/usr/bin/env python
"""Decompose the stress-scene tick into timed pieces on the real chip.

Each variant is its own jitted program (recompiles; keep the scene size
moderate unless you can afford ~minutes of compile per variant at 500k).

  PIES_PROF_TETS=8000 python scripts/profile_tick.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {1e3*dt:10.2f} ms")
    return dt


def main():
    n_tets = int(os.environ.get("PIES_PROF_TETS", 8000))
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver.step import tick, default_detect_collisions
    from pies_tpu.collision import broadphase

    def make(mode, iterations=4, stab=4, **kw):
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

    s = make("full")
    params = s.current_params()
    print(f"tets={n_tets} nodes={s._builder.num_nodes} "
          f"contact_cap={s._config.budget.max_point_tri_contacts} "
          f"body_nodes={s._config.body_nodes}")

    # settle the soup so the pile compacts and contacts are active
    for _ in range(int(os.environ.get("PIES_PROF_SETTLE", 30))):
        s.tick()
    state = s._state

    from functools import partial

    # 1. full tick (full coupling)
    cfgf = s._config
    bench("tick full-coupling", partial(tick, config=cfgf), state, s._topology, params)

    # 2. recentered coupling
    sr = make("recentered")
    bench("tick recentered", partial(tick, config=sr._config), state, sr._topology, params)

    # 3. detection only
    @partial(jax.jit, static_argnames=("config",))
    def detect(state, topo, params, config):
        colls = default_detect_collisions(
            state, state.positions, topo, params, config
        )
        return colls.pt_mask.sum(), colls.overflow

    nhits, _ = detect(state, s._topology, params, cfgf)
    print(f"  live contacts: {int(nhits)}")
    bench("detection (packed-body path)", partial(detect, config=cfgf), state, s._topology, params)

    # 3b. legacy body path for comparison
    import dataclasses
    cfg_legacy = dataclasses.replace(cfgf, body_nodes=0)
    bench("detection (legacy body path)", partial(detect, config=cfg_legacy), state, s._topology, params)

    # 4. no collisions at all (floor contacts still on)
    s0 = make("full", enable_collisions=False)
    bench("tick no-collisions", partial(tick, config=s0._config), state, s0._topology, params)

    # 5. CG-iteration scaling (recentered)
    s1 = make("recentered", cg_iterations=1)
    bench("tick recentered cg=1", partial(tick, config=s1._config), state, s1._topology, params)

    # 6. PD-iteration scaling (isolates per-iteration vs per-substep costs)
    s2 = make("recentered", iterations=1)
    bench("tick recentered iters=1", partial(tick, config=s2._config), state, s2._topology, params)

    # 7. stabilization off
    s3 = make("recentered", stab=0)
    bench("tick recentered stab=0", partial(tick, config=s3._config), state, s3._topology, params)


if __name__ == "__main__":
    main()
