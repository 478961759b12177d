#!/usr/bin/env python
"""Stage-level timing of the packed-body detection + tet-apply variants.

  PIES_PROF_TETS=125000 python -u scripts/profile_detection.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8


def bench(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:44s} {1e3*dt:10.3f} ms/rep", flush=True)
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
    from pies_tpu.collision.grid import (
        aabb_cell_slots, build_grid, gather_candidates, table_size_for,
    )
    from pies_tpu.collision.broadphase import _aabb_prefilter_pack
    from pies_tpu.collision.narrowphase import point_triangle_ccd

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
    for _ in range(int(os.environ.get("PIES_PROF_SETTLE", 10))):
        s.tick()
    state = s._state
    x = state.positions
    prev = state.prev_positions
    triangles = s._topology.triangles
    tri_mask = s._topology.tri_mask

    e = budget.body_stride
    m = config.body_nodes
    off = config.body_node_offset
    faces = config.body_faces
    t = triangles.shape[0]
    k = t // e
    cell = params.broadphase_cell
    print(f"bodies={k} m={m} e={e} nb={budget.max_narrow_bodies}", flush=True)

    def stage_candidates(i, acc, x, prev):
        xb = x[off : off + k * m].reshape(k, m, 3)
        pb = prev[off : off + k * m].reshape(k, m, 3)
        live_b = jnp.any((tri_mask > 0).reshape(k, e), axis=1)
        lo_b = jnp.minimum(xb.min(axis=1), pb.min(axis=1)) / cell
        hi_b = jnp.maximum(xb.max(axis=1), pb.max(axis=1)) / cell
        home = jnp.floor(lo_b).astype(jnp.int32)[:, None, :]
        hgrid = build_grid(home, live_b[:, None], table_size_for(k))
        q_coords, q_valid, _ = aabb_cell_slots(
            lo_b - 1.0, hi_b, budget.max_cells_per_tri, range_cap=8
        )
        cand_b, cand_b_valid, _ = gather_candidates(
            hgrid, q_coords, q_valid & live_b[:, None],
            per_cell_cap=budget.max_entries_per_cell,
            budget=budget.max_candidates_per_body,
        )
        return acc + cand_b.sum() + 0 * i

    bench("grid+candidates", dep_loop(stage_candidates), jnp.int32(0), x, prev)

    # Precompute up to the prefilter once; time the prefilter.
    xb = x[off : off + k * m].reshape(k, m, 3)
    pb = prev[off : off + k * m].reshape(k, m, 3)
    live_b = jnp.any((tri_mask > 0).reshape(k, e), axis=1)
    lo_b = jnp.minimum(xb.min(axis=1), pb.min(axis=1)) / cell
    hi_b = jnp.maximum(xb.max(axis=1), pb.max(axis=1)) / cell
    home = jnp.floor(lo_b).astype(jnp.int32)[:, None, :]
    hgrid = build_grid(home, live_b[:, None], table_size_for(k))
    q_coords, q_valid, _ = aabb_cell_slots(
        lo_b - 1.0, hi_b, budget.max_cells_per_tri, range_cap=8
    )
    cand_b, cand_b_valid, _ = jax.jit(partial(
        gather_candidates,
        per_cell_cap=budget.max_entries_per_cell,
        budget=budget.max_candidates_per_body,
    ))(hgrid, q_coords, q_valid & live_b[:, None])
    cand_b = jnp.minimum(cand_b, k - 1)
    margin = params.collision_threshold_distance / cell

    def stage_prefilter(i, acc, cand_b, cand_b_valid):
        packed_b, packed_valid, _, _ = _aabb_prefilter_pack(
            cand_b, cand_b_valid, lo_b, hi_b, margin, budget.max_narrow_bodies
        )
        return acc + packed_b.sum() + 0 * i

    bench("aabb prefilter+pack", dep_loop(stage_prefilter),
          jnp.int32(0), cand_b, cand_b_valid)

    packed_b, packed_valid = jax.jit(partial(
        _aabb_prefilter_pack, narrow=budget.max_narrow_bodies
    ))(cand_b, cand_b_valid, lo_b, hi_b, margin)
    own_b = jnp.arange(k, dtype=jnp.int32)[:, None]
    pair_ok = packed_valid & (packed_b != own_b) & live_b[:, None]
    nb = packed_b.shape[1]
    print("live pairs:", int(pair_ok.sum()), flush=True)

    def stage_gather(i, acc, packed_b):
        bd = jnp.concatenate([pb.reshape(k, 3 * m), xb.reshape(k, 3 * m)], axis=-1)
        other = bd[packed_b.reshape(-1)]
        return acc + other.sum() + 0 * i

    bench("packed body gather", dep_loop(stage_gather), jnp.float32(0), packed_b)

    bd = jnp.concatenate([pb.reshape(k, 3 * m), xb.reshape(k, 3 * m)], axis=-1)
    other = bd[packed_b.reshape(-1)]
    ok_flat = pair_ok.reshape(-1)

    def pcol(c):
        return other[:, 3 * c : 3 * c + 3]

    def ncol(c):
        return other[:, 3 * m + 3 * c : 3 * m + 3 * c + 3]

    def stage_ccd_only(i, acc, other, ok_flat):
        hits = jnp.zeros((), jnp.int32)
        for c in range(m):
            ap0 = jnp.repeat(pb[:, c], nb, axis=0)
            ap1 = jnp.repeat(xb[:, c], nb, axis=0)
            for f, (i0, i1, i2) in enumerate(faces):
                b0, b1 = pcol(i0), ncol(i0)
                hit, _ = point_triangle_ccd(
                    ap0 - b0, pcol(i1) - b0, pcol(i2) - b0,
                    ap1 - b1, ncol(i1) - b1, ncol(i2) - b1,
                    params.collision_threshold_distance,
                )
                hits = hits + (hit & ok_flat).sum(dtype=jnp.int32)
        return acc + hits + 0 * i

    bench("ccd 16 combos (no compaction)", dep_loop(stage_ccd_only),
          jnp.int32(0), other, ok_flat)

    cap = budget.max_point_tri_contacts

    def stage_ccd_compact(i, acc, other, ok_flat):
        hit_ids = jnp.full(cap + 1, -1, dtype=jnp.int32)
        count = jnp.int32(0)
        pair_idx = jnp.arange(k * nb, dtype=jnp.int32)
        n_combo = m * e
        for c in range(m):
            ap0 = jnp.repeat(pb[:, c], nb, axis=0)
            ap1 = jnp.repeat(xb[:, c], nb, axis=0)
            for f, (i0, i1, i2) in enumerate(faces):
                b0, b1 = pcol(i0), ncol(i0)
                hit, _ = point_triangle_ccd(
                    ap0 - b0, pcol(i1) - b0, pcol(i2) - b0,
                    ap1 - b1, ncol(i1) - b1, ncol(i2) - b1,
                    params.collision_threshold_distance,
                )
                hit = hit & ok_flat
                pos = count + jnp.cumsum(hit.astype(jnp.int32)) - 1
                dest = jnp.where(hit & (pos < cap), pos, cap)
                ids = pair_idx * n_combo + (c * e + f)
                hit_ids = hit_ids.at[dest].set(ids)
                count = count + hit.sum(dtype=jnp.int32)
        return acc + hit_ids.sum() + 0 * i

    bench("ccd + per-combo compaction (current)",
          dep_loop(stage_ccd_compact), jnp.int32(0), other, ok_flat)

    # ---- tet apply variants ------------------------------------------------
    print("--- tet apply variants ---", flush=True)
    from pies_tpu.ops.precision import einsum as _einsum
    topo = s._topology
    g = topo.strain.g  # [C,3,4]
    w = topo.strain.w
    c_tets = g.shape[0]
    xs = x[: 4 * c_tets].reshape(c_tets, 4, 3)

    def v_two_einsum(i, acc, xs):
        ecs = _einsum("cja,cad->cjd", g, xs)
        contrib = _einsum("cja,cjd->cad", g, ecs)
        return acc + (w[:, None, None] * contrib).sum() + 0 * i

    bench("two einsums (current)", dep_loop(v_two_einsum), jnp.float32(0), xs)

    wgtg = jnp.einsum("cja,cjb->cab", g, g) * w[:, None, None]  # [C,4,4]

    def v_wgtg(i, acc, xs):
        contrib = _einsum("cab,cbd->cad", wgtg, xs)
        return acc + contrib.sum() + 0 * i

    bench("precomputed w*GtG einsum", dep_loop(v_wgtg), jnp.float32(0), xs)

    def v_broadcast(i, acc, xs):
        contrib = jnp.sum(wgtg[..., None] * xs[:, None, :, :], axis=2)
        return acc + contrib.sum() + 0 * i

    bench("w*GtG broadcast-sum", dep_loop(v_broadcast), jnp.float32(0), xs)

    def v_unrolled(i, acc, xs):
        cols = [xs[:, b1, :] for b1 in range(4)]
        outs = []
        for a in range(4):
            acc_a = wgtg[:, a, 0, None] * cols[0]
            for b1 in range(1, 4):
                acc_a = acc_a + wgtg[:, a, b1, None] * cols[b1]
            outs.append(acc_a)
        contrib = jnp.stack(outs, axis=1)
        return acc + contrib.sum() + 0 * i

    bench("w*GtG unrolled fma", dep_loop(v_unrolled), jnp.float32(0), xs)

    # flat [4C,3] in/out with slice-adds (the actual apply shape)
    xflat = x[: 4 * c_tets]

    def v_flat(i, acc, xflat):
        xs_ = xflat.reshape(c_tets, 4, 3)
        cols = [xs_[:, b1, :] for b1 in range(4)]
        outs = []
        for a in range(4):
            acc_a = wgtg[:, a, 0, None] * cols[0]
            for b1 in range(1, 4):
                acc_a = acc_a + wgtg[:, a, b1, None] * cols[b1]
            outs.append(acc_a)
        y = jnp.stack(outs, axis=1).reshape(4 * c_tets, 3)
        return acc + y.sum() + 0 * i

    bench("flat in/out unrolled", dep_loop(v_flat), jnp.float32(0), xflat)


if __name__ == "__main__":
    main()
