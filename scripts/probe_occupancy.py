#!/usr/bin/env python
"""Probe broadphase/narrowphase buffer occupancy on the settled stress soup.

Prints candidate counts (bucket stage) and AABB-prefilter survivor counts
(narrow stage) so width-adaptation levels can be chosen from data.

  PIES_PROF_TETS=125000 python scripts/probe_occupancy.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n_tets = int(os.environ.get("PIES_PROF_TETS", 125_000))
    settle = int(os.environ.get("PIES_PROF_SETTLE", 20))

    from pies_tpu import Solver
    from pies_tpu.collision import broadphase as bp
    from pies_tpu.collision.grid import (
        aabb_cell_slots,
        build_grid,
        gather_candidates,
        table_size_for,
    )
    from pies_tpu.options import SolverName, SolverOptions

    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
    s._prepare()
    s.run_ticks(settle)
    params = s.current_params()
    cfg = s._config
    budget = cfg.budget
    st = s._state
    topo = s._topology

    @jax.jit
    def probe(x, prev, tris, tri_mask):
        e = budget.body_stride
        m = cfg.body_nodes
        off = cfg.body_node_offset
        t = tris.shape[0]
        k = t // e
        cell = params.broadphase_cell
        xb = x[off : off + k * m].reshape(k, m, 3)
        pb = prev[off : off + k * m].reshape(k, m, 3)
        live_b = jnp.any((tri_mask > 0).reshape(k, e), axis=1)
        lo_b = jnp.minimum(xb.min(axis=1), pb.min(axis=1)) / cell
        hi_b = jnp.maximum(xb.max(axis=1), pb.max(axis=1)) / cell
        lo_b = jnp.where(live_b[:, None], lo_b, 0.0)
        hi_b = jnp.where(live_b[:, None], hi_b, 0.0)
        margin = params.collision_threshold_distance / cell
        ins_coords, ins_valid = bp._insertion_slots(lo_b, hi_b, live_b)
        hgrid = build_grid(ins_coords, ins_valid, table_size_for(2 * k))
        q_coords, q_valid, _ = aabb_cell_slots(
            lo_b - 1.0, hi_b, budget.max_cells_per_tri, range_cap=8
        )
        n_qcells = jnp.sum(q_valid & live_b[:, None], axis=1)
        cand, cand_valid, _ = gather_candidates(
            hgrid,
            q_coords,
            q_valid & live_b[:, None],
            per_cell_cap=budget.max_entries_per_cell,
            budget=budget.max_candidates_per_body,
        )
        cand_counts = jnp.sum(cand_valid.astype(jnp.int32), axis=-1)
        cand = jnp.minimum(cand, k - 1)
        # mirror the production own-body drop before the prefilter
        cand_valid = cand_valid & (
            cand != jnp.arange(k, dtype=jnp.int32)[:, None]
        )
        packed, packed_valid, _, _ = bp._aabb_prefilter_pack(
            cand, cand_valid, lo_b, hi_b, margin, budget.max_narrow_bodies
        )
        narrow_counts = jnp.sum(packed_valid.astype(jnp.int32), axis=-1)
        # exclude own body from narrow counts (it always survives the AABB)
        own = jnp.arange(k, dtype=jnp.int32)[:, None]
        narrow_real = jnp.sum(
            (packed_valid & (packed != own)).astype(jnp.int32), axis=-1
        )
        hist = lambda c, n: [int(jnp.sum(c == i)) for i in range(n)]
        return dict(
            qcells_max=jnp.max(n_qcells),
            qcells_mean=jnp.mean(n_qcells.astype(jnp.float32)),
            cand_max=jnp.max(cand_counts),
            cand_mean=jnp.mean(cand_counts.astype(jnp.float32)),
            cand_p_hist=jnp.stack(
                [jnp.sum(cand_counts > i) for i in (0, 3, 6, 12, 23)]
            ),
            narrow_max=jnp.max(narrow_counts),
            narrow_mean=jnp.mean(narrow_counts.astype(jnp.float32)),
            narrow_gt=jnp.stack(
                [jnp.sum(narrow_counts > i) for i in (0, 1, 2, 4, 7)]
            ),
            narrow_real_max=jnp.max(narrow_real),
            live_pairs_total=jnp.sum(narrow_counts),
            btotal_like_max=jnp.max(cand_counts),
        )

    out = probe(st.positions, st.prev_positions, topo.triangles, topo.tri_mask)
    for kk, v in out.items():
        print(kk, v)


if __name__ == "__main__":
    main()
