"""Tet-column PD fast path: the whole local/global iteration in flat columns.

For disjoint-tet scenes (every node owned by exactly one contiguous tet —
the ``Topology.tet_block6`` layout) with diagonal-only contact coupling, the
PD global system is EXACTLY block-diagonal in 4x4 per-tet blocks: the only
off-diagonal terms are the within-tet strain/volume ``w·AᵀA`` entries
(``Solver.cpp:184-210``); point-triangle / floor contacts enter through the
dense diagonal only (recentered coupling, see options.StepConfig).

The generic path (pd.pd_substep + assembly.pcg_solve) is mathematically
right but keeps converting between node-major ``[N, 3]`` and tet-major
``[K, 4]``/``[K, 12]`` layouts *inside* the iteration loop — measured
11.8 ms/tick of pure data formatting at 500k particles (relayout copies run
at 20-45 GB/s effective vs the 819 GB/s peak because the minor dims
tile-pad).  This module keeps the ENTIRE iteration in corner-major flat
columns ``x[a][d] : f32[K]`` (corner a of every tet, axis d):

* corner positions for the deformation gradient are the columns themselves
  (no strided slices, no gathers);
* the per-tet force lands as 12 columns (no ``[K, 12] -> [N, 3]`` reshape);
* the global solve is a batched 4x4 Cholesky solve on columns
  (``assembly.tet_block_factor`` math, minus all reshapes);
* contact terms scatter into ONE flat corner-major buffer whose per-corner
  slices are tile-aligned.

Node-major ``[N, 3]`` state exists only outside the loop: one conversion in
per substep, one out.  Everything here is bit-compatible with the generic
path up to float reassociation (validated by tests/test_solver.py's
fast-vs-generic trajectory test).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..collision.batches import ATA_DIFF4, W_POINT_TRI, W_STATIC, CollisionSet
from ..constraints.projections import tet_force12_fused_cols
from ..options import PhysicsParams, StepConfig
from ..topology import Topology

_SMALL = 8192  # live-contact prefix cap (see batches.capped_contact_acc)


def applies(state, topo: Topology, colls: CollisionSet, config: StepConfig,
            inv_dense) -> bool:
    """Static eligibility for the tet-column fast path.

    Requires the block-diagonal layout (``tet_block6`` covering the whole
    capacity), the fused contiguous tet local step, diagonal-only contact
    coupling, the dense floor mode, and no other constraint families (each
    extra family is diagonal-only in the operator but would need its own
    column-space force port; scenes that have them take the generic path).

    Position pins ARE admitted: their operator contribution is purely
    diagonal (A = B = I, ``Constraints.cpp:65-74``) so the 4x4 block
    structure holds (the +w rides ``diag``), and their force is the
    build-time constant ``Topology.position_force_dense`` folded into the
    inertia term — a soup with a few pinned nodes keeps the fast path
    instead of quadrupling its tick on the generic one (VERDICT r4 #6).
    """
    n_pins = topo.position.idx.shape[0]
    return (
        config.tet_cols
        and inv_dense is None
        and topo.tet_block6 is not None
        and topo.tet_block6.shape[-1] * 4 == state.capacity
        and config.tet_fused
        and config.strain_contiguous
        and config.volume_contiguous
        and config.contact_coupling in ("diagonal", "recentered")
        and topo.distance.idx.shape[0] == 0
        and (
            n_pins == 0
            or topo.position_force_dense.shape[0] == state.capacity
        )
        and topo.bend.idx.shape[0] == 0
        and topo.shape.node_idx.shape[0] == 0
        and topo.goal.node_idx.shape[0] == 0
        and colls.nn_idx.shape[0] == 0
        and colls.edge_idx.shape[0] == 0
        and colls.floor_active.shape[0] > 0
    )


# ---------------------------------------------------------------------------
# layout conversion (once per substep each way)


def node_col_to_corners(v: jax.Array):
    """``f32[N]`` node-major -> 4 corner columns ``f32[K]`` (node 4t+a ->
    column a, row t).  One physical [K,4]->[4,K] transpose."""
    k = v.shape[0] // 4
    t = jax.lax.optimization_barrier(v.reshape(k, 4).T)
    return tuple(t[a] for a in range(4))


def node3_to_cols(x: jax.Array):
    """``f32[N, 3]`` -> nested ``cols[a][d] : f32[K]``."""
    per_axis = [node_col_to_corners(x[:, d]) for d in range(3)]
    return tuple(
        tuple(per_axis[d][a] for d in range(3)) for a in range(4)
    )


def cols_to_node3(cols) -> jax.Array:
    """Inverse of :func:`node3_to_cols`."""
    axes = []
    for d in range(3):
        m = jnp.stack([cols[a][d] for a in range(4)])  # [4, K]
        axes.append(jax.lax.optimization_barrier(m.T).reshape(-1))
    return jnp.stack(axes, axis=-1)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# block solve (assembly.tet_block_factor math on columns)


def block_factor_cols(dcols, block6: jax.Array):
    """Batched 4x4 Cholesky from the diagonal's corner columns; same math as
    ``assembly.tet_block_factor`` with the reshape/transpose removed."""
    d0, d1, d2, d3 = dcols
    b01, b02, b03, b12, b13, b23 = (block6[i] for i in range(6))
    i00 = jax.lax.rsqrt(d0)
    l10 = b01 * i00
    l20 = b02 * i00
    l30 = b03 * i00
    i11 = jax.lax.rsqrt(d1 - l10 * l10)
    l21 = (b12 - l20 * l10) * i11
    l31 = (b13 - l30 * l10) * i11
    i22 = jax.lax.rsqrt(d2 - l20 * l20 - l21 * l21)
    l32 = (b23 - l30 * l20 - l31 * l21) * i22
    i33 = jax.lax.rsqrt(d3 - l30 * l30 - l31 * l31 - l32 * l32)
    return (l10, l20, l30, l21, l31, l32, i00, i11, i22, i33)


def block_solve_cols(factors, rcols):
    """Solve ``(L Lᵀ) z = r`` per block for 3 stacked RHS, all on columns."""
    l10, l20, l30, l21, l31, l32, i00, i11, i22, i33 = factors
    out = []
    for d in range(3):
        r0, r1, r2, r3 = (rcols[a][d] for a in range(4))
        y0 = r0 * i00
        y1 = (r1 - l10 * y0) * i11
        y2 = (r2 - l20 * y0 - l21 * y1) * i22
        y3 = (r3 - l30 * y0 - l31 * y1 - l32 * y2) * i33
        z3 = y3 * i33
        z2 = (y2 - l32 * z3) * i22
        z1 = (y1 - l21 * z2 - l31 * z3) * i11
        z0 = (y0 - l10 * z1 - l20 * z2 - l30 * z3) * i00
        out.append((z0, z1, z2, z3))
    # out[d][a] -> cols[a][d]
    return tuple(tuple(out[d][a] for d in range(3)) for a in range(4))


def _block_matvec_cols(dcols, block6, xc):
    """``A·x`` of the block-diagonal system on columns (for the reported
    residual — the solve itself is direct)."""
    b01, b02, b03, b12, b13, b23 = (block6[i] for i in range(6))
    off = {
        (0, 1): b01, (0, 2): b02, (0, 3): b03,
        (1, 2): b12, (1, 3): b13, (2, 3): b23,
    }
    out = []
    for a in range(4):
        row = []
        for d in range(3):
            acc = dcols[a] * xc[a][d]
            for b_ in range(4):
                if b_ == a:
                    continue
                key = (min(a, b_), max(a, b_))
                acc = acc + off[key] * xc[b_][d]
            row.append(acc)
        out.append(tuple(row))
    return tuple(out)


# ---------------------------------------------------------------------------
# contact force in column space


def _remap_corner_major(idx: jax.Array, kp: int) -> jax.Array:
    """Node ids (node = 4t + a) -> corner-major flat slots ``a·Kp + t``."""
    return (idx % 4) * kp + idx // 4


def pt_force_cols(
    xc, pt_idx_cm, pt_w, pt_count, thickness, k: int, kp: int, dtype
):
    """Point-triangle recentered force correction in column space.

    Computes the projection delta (``CollisionConstraint.cpp:86-124``'s
    point push-out: only the point moves, out along the triangle normal)
    from corner-major gathers of the current iterate ``xc`` and scatters
    ``w·AᵀA[:, 0]·delta`` at all 4 contact nodes into ONE flat ``[12·Kp]``
    accumulator whose (corner a, axis d) slice is ``[(3a + d)·Kp : +K]`` —
    tile-aligned because ``Kp`` is a multiple of 1024.  ``pt_idx_cm`` holds
    the corner-major contact slots ``(node % 4)·Kp + node // 4``; ``pt_w``
    the masked weights (``W_POINT_TRI · pt_mask``).  The whole pass runs on
    the live prefix of the packed contact buffer when few contacts are live
    (batches.capped_contact_acc discipline).
    """
    xflat = [
        jnp.concatenate([xc[a][d] for a in range(4)]) for d in range(3)
    ]  # corner-major [4K] per axis (slot = corner·K + tet)
    col0 = [float(ATA_DIFF4[a, 0]) for a in range(4)]

    def acc_fn(sl):
        idx = pt_idx_cm[sl]  # [C, 4] corner-major slots (stride Kp)
        w = pt_w[sl]
        # gather slots use stride K (the xflat layout), scatter uses Kp
        gidx = (idx // kp) * k + idx % kp
        ii = gidx.T.reshape(-1)  # [4C]
        c = idx.shape[0]
        g = [xflat[d][ii] for d in range(3)]  # per axis [4C]
        pa = [g[d][0 * c : 1 * c] for d in range(3)]
        pb = [g[d][1 * c : 2 * c] for d in range(3)]
        pc = [g[d][2 * c : 3 * c] for d in range(3)]
        pd_ = [g[d][3 * c : 4 * c] for d in range(3)]
        e1 = [pc[d] - pb[d] for d in range(3)]
        e2 = [pd_[d] - pb[d] for d in range(3)]
        nx = e1[1] * e2[2] - e1[2] * e2[1]
        ny = e1[2] * e2[0] - e1[0] * e2[2]
        nz = e1[0] * e2[1] - e1[1] * e2[0]
        nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        inv = 1.0 / jnp.maximum(nn, 1e-20)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        ndp = (
            nx * (pa[0] - pb[0])
            + ny * (pa[1] - pb[1])
            + nz * (pa[2] - pb[2])
        )
        disp = jnp.where(ndp < thickness, thickness - ndp, 0.0)
        delta = (disp * nx, disp * ny, disp * nz)
        # One scatter: row (constraint node a, axis d, contact i) lands at
        # (3·corner(node) + d)·Kp + tet(node); idx[:, a] = corner·Kp + tet.
        upd = jnp.concatenate(
            [
                (w * col0[a]) * delta[d]
                for a in range(4)
                for d in range(3)
            ]
        )
        slots = jnp.concatenate(
            [
                3 * (idx[:, a] // kp) * kp + d * kp + idx[:, a] % kp
                for a in range(4)
                for d in range(3)
            ]
        )
        return jnp.zeros((12 * kp,), dtype).at[slots].add(upd)

    return _capped(pt_idx_cm.shape[0], pt_count, acc_fn)


def substep_cols(
    x: jax.Array,
    msn_h2: jax.Array,
    diag: jax.Array,
    pt_diag: jax.Array | None,
    mask: jax.Array,
    topo: Topology,
    colls: CollisionSet,
    params: PhysicsParams,
    config: StepConfig,
):
    """Run the PD iteration loop in column space.

    Returns ``(x_new [N,3], static_proj [N,3], residual)`` — drop-in for the
    generic loop's outputs consumed by stabilization/velocity passes.
    """
    n = x.shape[0]
    k = n // 4
    kp = _round_up(k, 1024)
    dtype = x.dtype

    # Position-pin force: w·target is a build-time constant per node
    # (Constraints.cpp:65-74) — fold it into the inertia term once, exactly
    # as assemble_force's dense branch adds it per iteration.
    if topo.position.idx.shape[0]:
        msn_h2 = msn_h2 + topo.position_force_dense

    xc = node3_to_cols(x)
    msn_c = node3_to_cols(msn_h2)
    mask_c = node_col_to_corners(mask)
    diag_c = node_col_to_corners(diag)
    factors = block_factor_cols(diag_c, topo.tet_block6)

    # Floor force multipliers (assemble_force's dense branch):
    # w·count·active per node, constant across the iteration loop.
    wf = W_STATIC * topo.floor_count * colls.floor_active
    wf_c = node_col_to_corners(wf)
    plane = (
        jnp.zeros_like(params.floor_height)
        if config.reference_quirks
        else params.floor_height
    )

    have_pt = colls.pt_idx.shape[0] > 0
    if have_pt:
        ptd_c = node_col_to_corners(pt_diag)
        idx_cm = _remap_corner_major(colls.pt_idx, kp)
        pt_w = W_POINT_TRI * colls.pt_mask
        pt_count = jnp.sum(colls.pt_mask)
    else:
        ptd_c = None

    # Tet batch rows may undershoot K (node-capacity padding): slice the
    # corner columns to the batch length and zero-pad the force back.
    c_tet = topo.strain.idx.shape[0]

    def tet_force(xc_it):
        p = [[xc_it[a][d][:c_tet] for d in range(3)] for a in range(4)]
        f12 = tet_force12_fused_cols(p, topo.strain, topo.volume)
        if c_tet < k:
            pad = jnp.zeros((k - c_tet,), dtype)
            f12 = [jnp.concatenate([f, pad]) for f in f12]
        return f12  # index 3a + d

    def make_iteration(with_pt):
        def iteration(_, carry):
            xc_it, _, _ = carry
            f12 = tet_force(xc_it)
            if with_pt:
                contact = pt_force_cols(
                    xc_it, idx_cm, pt_w, pt_count,
                    params.collision_thickness, k, kp, dtype,
                )
            force = []
            for a in range(4):
                row = []
                sp_y = jnp.maximum(xc_it[a][1], plane)
                for d in range(3):
                    fad = msn_c[a][d] + f12[3 * a + d]
                    # dense floor: w·count·active · (x with y clamped)
                    fad = fad + wf_c[a] * (sp_y if d == 1 else xc_it[a][d])
                    if with_pt:
                        fad = fad + ptd_c[a] * xc_it[a][d]
                        fad = fad + jax.lax.slice(
                            contact, ((3 * a + d) * kp,),
                            ((3 * a + d) * kp + k,),
                        )
                    row.append(fad)
                force.append(tuple(row))
            force = tuple(force)
            zc = block_solve_cols(factors, force)
            # Padded nodes keep their park position (mask re-select, as the
            # generic loop does after CG).
            x_new = tuple(
                tuple(
                    jnp.where(mask_c[a] > 0, zc[a][d], xc_it[a][d])
                    for d in range(3)
                )
                for a in range(4)
            )
            # The force that produced x_new rides the carry so the reported
            # residual (diagnostics parity with pcg_solve's ||b − A·x||) is
            # computed ONCE after the loop — the per-iteration residual
            # matvec was 4 extra passes over the state per tick for a
            # number only the last iteration of which anyone reads.
            return x_new, xc_it, force

        return iteration

    force0 = tuple(
        tuple(jnp.zeros_like(xc[a][d]) for d in range(3)) for a in range(4)
    )
    carry0 = (xc, xc, force0)

    def run_loop(with_pt):
        it = make_iteration(with_pt)

        def fn(c):
            if config.unroll_loops and config.iterations <= 8:
                # Static unroll: removes per-trip loop boundaries (the
                # 96-column carry pays a sync each trip) and lets XLA fuse
                # the block solve into the next iteration's local step.
                for _i in range(config.iterations):
                    c = it(_i, c)
                return c
            return jax.lax.fori_loop(0, config.iterations, it, c)

        return fn

    if have_pt:
        x_fin, x_stale, force_fin = jax.lax.cond(
            jnp.sum(colls.pt_mask) > 0,
            run_loop(True),
            run_loop(False),
            carry0,
        )
    else:
        x_fin, x_stale, force_fin = run_loop(False)(carry0)
    if config.iterations > 0:
        az = _block_matvec_cols(diag_c, topo.tet_block6, x_fin)
        res2 = jnp.asarray(0.0, dtype)
        for a in range(4):
            for d in range(3):
                r = force_fin[a][d] - az[a][d]
                r = jnp.where(mask_c[a] > 0, r, 0.0)
                res2 = res2 + jnp.sum(r * r)
        residual = jnp.sqrt(res2)
    else:
        residual = jnp.asarray(0.0, dtype)

    static_c = tuple(
        tuple(
            jnp.maximum(x_stale[a][1], plane) if d == 1 else x_stale[a][d]
            for d in range(3)
        )
        for a in range(4)
    )
    return cols_to_node3(x_fin), cols_to_node3(static_c), residual


def _capped(cap: int, count: jax.Array, acc_fn, small: int = _SMALL):
    """Prefix-truncated contact pass (see batches.capped_contact_acc)."""
    if cap <= small:
        return acc_fn(slice(None))
    return jax.lax.cond(
        count <= small,
        lambda _: acc_fn(slice(0, small)),
        lambda _: acc_fn(slice(None)),
        None,
    )
