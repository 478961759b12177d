#!/usr/bin/env python
"""Measure the CPU transcription baseline -> BASELINE_CPU.json.

The reference's C++ cannot be built here (its Extern/ submodules — glm,
eigen, phmap, tetgen — are empty in the snapshot), so per SURVEY §6 the
baseline is a *faithful CPU transcription*: this engine's own pipeline
compiled by XLA for one CPU core, running the identical tet-soup workload.
The recorded single-core rate is multiplied by the reference's 8-thread
assumption (``Solver.h:36``) when `bench.py` computes ``vs_baseline`` —
deliberately generous to the reference (its hash-map broadphase and Eigen
Cholesky would not scale linearly to 8 threads).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions

    n_tets = int(os.environ.get("PIES_CPU_TETS", 2048))
    ticks = int(os.environ.get("PIES_CPU_TICKS", 10))

    solver = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    solver.create_tet_soup(
        n_tets, spacing=1.6, scale=0.8, w=2000.0, height=0.5, jitter=0.05
    )
    for _ in range(3):
        solver.tick()

    t0 = time.perf_counter()
    for _ in range(ticks):
        solver.tick()
    elapsed = time.perf_counter() - t0
    assert not solver.sim_failed

    n = solver._builder.num_nodes
    steps_per_sec = ticks / elapsed
    iters = solver.options.iterations * solver.options.time_substeps
    out = {
        "method": (
            "faithful CPU transcription (this engine, XLA CPU, 1 core) on the "
            "tet-soup workload; reference C++ unbuildable (empty Extern/ "
            "submodules)"
        ),
        "scene": f"tet_soup_{n}p",
        "particles": n,
        "steps_per_sec_single_core": round(steps_per_sec, 4),
        "particle_iters_per_sec_single_core": round(steps_per_sec * n * iters),
        "reference_thread_assumption": 8,
        "host": "1-core container",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_CPU.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
