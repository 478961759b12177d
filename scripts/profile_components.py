#!/usr/bin/env python
"""Per-component timing of the PD substep at stress scale on the real chip.

Each component runs inside one jitted fori_loop with a data dependence so
XLA can't elide repetitions; reported per-repetition.

  PIES_PROF_TETS=125000 python -u scripts/profile_components.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 8


def bench(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:40s} {1e3*dt:10.3f} ms/rep", flush=True)
    return dt


def dep_loop(body):
    def run(x, *args):
        def step(i, carry):
            return body(i, carry, *args)
        return jax.lax.fori_loop(0, REPS, step, x)
    return run


def main():
    n_tets = int(os.environ.get("PIES_PROF_TETS", 125_000))
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver import assembly
    from pies_tpu.solver.step import default_detect_collisions
    from pies_tpu.collision.batches import empty_collision_set

    s = Solver(
        SolverOptions(solver=SolverName.PD),
        enable_collisions=True,
        contact_coupling="recentered",
    )
    s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
    s._prepare()
    params = s.current_params()
    config = s._config
    topo = s._topology
    print(f"tets={n_tets} nodes={s._builder.num_nodes}", flush=True)
    for _ in range(int(os.environ.get("PIES_PROF_SETTLE", 10))):
        s.tick()
    state = s._state
    x = state.positions
    h = params.dt
    h2 = h * h
    mass_over_h2 = state.mass / h2

    colls = jax.jit(
        partial(default_detect_collisions, config=config),
    )(state, x, topo, params)
    print(f"live contacts: {int(colls.pt_mask.sum())}", flush=True)
    colls0 = empty_collision_set(
        pt_cap=0, static_cap=colls.static_idx.shape[0]
    )
    import dataclasses
    colls0 = dataclasses.replace(
        colls0, static_idx=colls.static_idx, static_mask=colls.static_mask
    )

    static_diag = assembly.static_collision_diag(colls, state.capacity, x.dtype)
    diag = assembly.system_diag(mass_over_h2, topo, colls)

    # 1. one CG operator application (with contacts, recentered: diag-only)
    def apply_once(i, xc, colls, sd):
        y = assembly.apply_system(
            xc, mass_over_h2, topo, colls,
            strain_contiguous=config.strain_contiguous,
            volume_contiguous=config.volume_contiguous,
            static_diag=sd, contact_coupling="recentered",
        )
        return xc + 1e-20 * y

    bench("matvec (recentered)", dep_loop(apply_once), x, colls, static_diag)

    # 1b. matvec without any collision terms
    bench("matvec (no colls)", dep_loop(apply_once), x, colls0, static_diag)

    # 1c. the tet einsum block alone
    from pies_tpu.constraints import projections as proj
    from pies_tpu.ops.precision import einsum as _einsum

    def tet_block(i, xc):
        y = jnp.zeros_like(xc)
        for batch, contig in ((topo.strain, config.strain_contiguous),
                              (topo.volume, config.volume_contiguous)):
            xg = proj.gather_tet_nodes(xc, batch, contig)
            e = _einsum("cja,cad->cjd", batch.g, xg)
            contrib = _einsum("cja,cjd->cad", batch.g, e)
            y = assembly._tet_scatter_add(
                y, batch, batch.w[:, None, None] * contrib, contig
            )
        return xc + 1e-20 * y

    bench("tet AtA block alone", dep_loop(tet_block), x)

    # 1d. diag multiply alone
    def diag_mul(i, xc):
        return xc + 1e-20 * ((mass_over_h2 + static_diag)[:, None] * xc)

    bench("diag multiply alone", dep_loop(diag_mul), x)

    # 2. full pcg_solve (16 iters) as one unit
    def pcg(i, xc, colls, sd):
        matvec = partial(
            assembly.apply_system, mass_over_h2=mass_over_h2, topo=topo,
            colls=colls, strain_contiguous=config.strain_contiguous,
            volume_contiguous=config.volume_contiguous,
            static_diag=sd, contact_coupling="recentered",
        )
        xn, _ = assembly.pcg_solve(
            lambda v: matvec(v), xc * (mass_over_h2[:, None]), xc, diag, 16
        )
        return xc + 1e-20 * xn

    t = bench("pcg_solve x16", dep_loop(pcg), x, colls, static_diag)

    # 3. local step
    def local(i, xc, colls):
        ls = assembly.local_step(
            xc, state.inv_mass, state.mass, state.shape_quats, topo, colls,
            params.collision_thickness, params.floor_height,
            config.rotation_iterations, config.reference_quirks,
            config.strain_contiguous, config.volume_contiguous,
        )
        return xc + 1e-20 * ls.strain[:, 0, :].sum() + 0 * i

    bench("local step", dep_loop(local), x, colls)

    # 4. assemble_force (recentered)
    def force(i, xc, colls):
        ls = assembly.local_step(
            xc, state.inv_mass, state.mass, state.shape_quats, topo, colls,
            params.collision_thickness, params.floor_height,
            config.rotation_iterations, config.reference_quirks,
            config.strain_contiguous, config.volume_contiguous,
        )
        pt_diag = assembly.point_tri_collision_diag(colls, state.capacity, x.dtype)
        f = assembly.assemble_force(
            xc * mass_over_h2[:, None], ls, topo, colls,
            config.strain_contiguous, config.volume_contiguous,
            contact_coupling="recentered", x=xc, pt_diag=pt_diag,
        )
        return xc + 1e-20 * f

    bench("local+force (recentered)", dep_loop(force), x, colls)

    # 5. detection
    def detect(i, xc):
        c = default_detect_collisions(state, xc, topo, params, config)
        return xc + 1e-20 * c.pt_mask.sum()

    bench("detection", dep_loop(detect), x)

    # 6. stabilization pass (x4)
    from pies_tpu.collision.batches import stabilize_point_tri

    def stab(i, xc, colls):
        xn, pn = xc, xc
        for _ in range(4):
            xn, pn = stabilize_point_tri(
                xn, pn, state.inv_mass, colls.pt_idx, colls.pt_mask,
                params.collision_thickness,
            )
        return xn

    bench("stabilization x4", dep_loop(stab), x, colls)


if __name__ == "__main__":
    main()
