#!/usr/bin/env python
"""Dependence-carried per-component timing at stress scale (round-2 rev).

Every stage's inputs are perturbed by the loop carry so XLA cannot hoist
the computation out of the timing loop.

  PIES_PROF_TETS=125000 python -u scripts/profile_components2.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 16


def _sync(out):
    # value fetch: block_until_ready can fake-return over the remote tunnel
    import numpy as _np
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = _np.asarray(leaf).ravel()[:1]


def bench(label, fn, *args):
    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.perf_counter()
    _sync(f(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:44s} {1e3*dt:10.3f} ms/rep", flush=True)
    return dt


def dep_loop(body):
    """body(xc, *args) -> xc'  — xc is carried, so nothing hoists."""

    def run(x, *args):
        def step(i, xc):
            return body(xc, *args)

        return jax.lax.fori_loop(0, REPS, step, x)

    return run


def main():
    n_tets = int(os.environ.get("PIES_PROF_TETS", 125_000))
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.solver import assembly
    from pies_tpu.solver.step import default_detect_collisions
    from pies_tpu.collision.grid import (
        aabb_cell_slots, build_grid, gather_candidates, table_size_for,
    )
    from pies_tpu.collision import broadphase as bp

    s = Solver(
        SolverOptions(solver=SolverName.PD),
        enable_collisions=True,
        contact_coupling="recentered",
    )
    s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
    s._prepare()
    params = s.current_params()
    config = s._config
    budget = config.budget
    topo = s._topology
    for _ in range(int(os.environ.get("PIES_PROF_SETTLE", 10))):
        s.tick()
    state = s._state
    x0 = state.positions
    h2 = params.dt * params.dt
    mass_over_h2 = state.mass / h2

    e = budget.body_stride
    m = config.body_nodes
    off = config.body_node_offset
    t = topo.triangles.shape[0]
    k = t // e
    cell = params.broadphase_cell
    print(f"bodies={k} nodes={s._builder.num_nodes}", flush=True)

    colls = jax.jit(partial(default_detect_collisions, config=config))(
        state, x0, topo, params
    )
    print("live contacts:", int(colls.pt_mask.sum()), flush=True)
    static_diag = assembly.static_collision_diag(
        colls, state.capacity, x0.dtype, topo.floor_count
    )
    diag = assembly.system_diag(mass_over_h2, topo, colls)

    # full detection, carried
    def det(xc):
        c = default_detect_collisions(state, xc, topo, params, config)
        return xc + 1e-20 * c.pt_mask.sum()

    bench("detection (full)", dep_loop(det), x0)

    # detection sub-stages, all carried through xc
    def stage_aabbs(xc):
        xb = xc[off : off + k * m].reshape(k, m, 3)
        pbv = state.prev_positions[off : off + k * m].reshape(k, m, 3)
        lo_b = jnp.minimum(xb.min(axis=1), pbv.min(axis=1)) / cell
        hi_b = jnp.maximum(xb.max(axis=1), pbv.max(axis=1)) / cell
        return xc + 1e-20 * (lo_b.sum() + hi_b.sum())

    bench("  body aabbs", dep_loop(stage_aabbs), x0)

    live_b = jnp.any((topo.tri_mask > 0).reshape(k, e), axis=1)

    def stage_grid(xc):
        xb = xc[off : off + k * m].reshape(k, m, 3)
        pbv = state.prev_positions[off : off + k * m].reshape(k, m, 3)
        lo_b = jnp.minimum(xb.min(axis=1), pbv.min(axis=1)) / cell
        hi_b = jnp.maximum(xb.max(axis=1), pbv.max(axis=1)) / cell
        ins_c, ins_v = bp._insertion_slots(lo_b, hi_b, live_b)
        hgrid = build_grid(ins_c, ins_v, table_size_for(k))
        return xc + 1e-20 * hgrid.sorted_items.sum()

    bench("  + build_grid (sort)", dep_loop(stage_grid), x0)

    def stage_query(xc):
        xb = xc[off : off + k * m].reshape(k, m, 3)
        pbv = state.prev_positions[off : off + k * m].reshape(k, m, 3)
        lo_b = jnp.minimum(xb.min(axis=1), pbv.min(axis=1)) / cell
        hi_b = jnp.maximum(xb.max(axis=1), pbv.max(axis=1)) / cell
        ins_c, ins_v = bp._insertion_slots(lo_b, hi_b, live_b)
        hgrid = build_grid(ins_c, ins_v, table_size_for(k))
        q_coords, q_valid, _ = aabb_cell_slots(
            lo_b - 1.0, hi_b, budget.max_cells_per_tri, range_cap=8
        )
        cand_b, cand_v, _ = gather_candidates(
            hgrid, q_coords, q_valid & live_b[:, None],
            per_cell_cap=budget.max_entries_per_cell,
            budget=budget.max_candidates_per_body,
        )
        return xc + 1e-20 * cand_b.sum()

    bench("  + query/gather_candidates", dep_loop(stage_query), x0)

    # matvec (banded) carried
    def mv(xc, colls, sd):
        y = assembly.apply_system(
            xc, mass_over_h2, topo, colls,
            static_diag=sd, contact_coupling="recentered",
        )
        return xc + 1e-20 * y

    bench("matvec (banded, recentered)", dep_loop(mv), x0, colls, static_diag)

    # pcg 16 carried
    def pcg(xc, colls, sd):
        matvec = partial(
            assembly.apply_system, mass_over_h2=mass_over_h2, topo=topo,
            colls=colls, static_diag=sd, contact_coupling="recentered",
        )
        xn, _ = assembly.pcg_solve(
            lambda v: matvec(v), xc * mass_over_h2[:, None], xc, diag, 16
        )
        return xc + 1e-20 * xn

    bench("pcg x16", dep_loop(pcg), x0, colls, static_diag)

    # local step carried
    def local(xc, colls):
        ls = assembly.local_step(
            xc, state.inv_mass, state.mass, state.shape_quats, topo, colls,
            params.collision_thickness, params.floor_height,
            config.rotation_iterations, config.reference_quirks,
            config.strain_contiguous, config.volume_contiguous,
        )
        return xc + 1e-20 * ls.strain.sum()

    bench("local step", dep_loop(local), x0, colls)

    # local + force carried
    def force(xc, colls):
        ls = assembly.local_step(
            xc, state.inv_mass, state.mass, state.shape_quats, topo, colls,
            params.collision_thickness, params.floor_height,
            config.rotation_iterations, config.reference_quirks,
            config.strain_contiguous, config.volume_contiguous,
        )
        pt_diag = assembly.point_tri_collision_diag(
            colls, state.capacity, x0.dtype
        )
        f = assembly.assemble_force(
            xc * mass_over_h2[:, None], ls, topo, colls,
            config.strain_contiguous, config.volume_contiguous,
            contact_coupling="recentered", x=xc, pt_diag=pt_diag,
        )
        return xc + 1e-20 * f

    bench("local+force (recentered)", dep_loop(force), x0, colls)

    # stabilization carried
    from pies_tpu.collision.batches import stabilize_point_tri

    def stab(xc, colls):
        xn, pn = xc, xc
        for _ in range(4):
            xn, pn = stabilize_point_tri(
                xn, pn, state.inv_mass, colls.pt_idx, colls.pt_mask,
                params.collision_thickness,
            )
        return xn

    bench("stabilization x4 (pt only)", dep_loop(stab), x0, colls)

    # whole tick for reference
    from pies_tpu.solver.step import tick
    import time as _t
    st = state
    r = tick(st, topo, params, config)
    jax.block_until_ready(r)
    t0 = _t.perf_counter()
    for _ in range(3):
        st2, _ = tick(st, topo, params, config)
    jax.block_until_ready(st2.positions)
    print(f"{'tick (full)':44s} {1e3*(_t.perf_counter()-t0)/3:10.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
