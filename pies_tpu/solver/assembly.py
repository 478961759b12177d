"""Global-system assembly for the Projective-Dynamics solver.

The reference assembles an N x N sparse matrix (per-node scalar system solved
with 3 right-hand sides at once, ``Solver.cpp:174-220,356``) and prefactors it
with ``Eigen::SimplicialLLT`` — re-factorizing every substep once collision
constraints enter (``Solver.cpp:242-262``).  The TPU-native replacement is
matrix-free: the operator

    ``y = (M/h²)·x + Σ_constraints w·AᵀA·x``

is a sum of gather → tiny-matmul → scatter passes, applied inside a
Jacobi-preconditioned conjugate-gradient loop that stays resident in HBM.
Collision constraints simply contribute extra terms to the operator and the
preconditioner diagonal — no re-factorization, which is the structural win
over the reference (SURVEY §2.7 item 6).

All scatters use ``jnp``'s ``.at[].add``; XLA's TPU scatter-add is
deterministic, so trajectories are bit-reproducible run-to-run (unlike the
reference's thread-order-dependent accumulation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.precision import einsum as _einsum

from ..collision.batches import (
    ATA_DIFF4,
    W_EDGE,
    W_NODE_NODE,
    W_POINT_TRI,
    W_STATIC,
    CollisionSet,
    capped_col_scatter,
    project_edge_edge,
    project_node_node,
    project_point_tri,
    project_static,
    project_static_dense,
)
from ..constraints import projections as proj
from ..topology import Topology


class LocalStep(NamedTuple):
    """All projected auxiliary configurations for one PD iteration."""

    distance: jax.Array  # [Cd, 3]  (p0 − p1; see project_distance_delta)
    position: jax.Array  # [Cp, 3]
    strain: jax.Array  # [Cs, 4, 3] ([0,4,3] when the flat path is active)
    volume: jax.Array  # [Cv, 4, 3]
    # Flat per-tet force contributions w·AᵀB·p̂ (see projections.tet_force12);
    # [0, 12] when the stacked path is active.
    strain_force12: jax.Array  # [Cs, 12]
    volume_force12: jax.Array  # [Cv, 12]
    bend: jax.Array  # [Cb, 4, 3]
    shape: jax.Array  # [Ms, 3] per-member
    goal: jax.Array  # [Mg, 3] per-member
    point_tri: jax.Array  # [K, 4, 3]
    point_tri_delta: jax.Array  # [K, 3] point displacement (proj − current)
    edge: jax.Array  # [E, 4, 3]
    edge_delta: jax.Array  # [E, 4, 3] (proj − current, all four nodes move)
    node_node: jax.Array  # [P, 2, 3]
    static: jax.Array  # [S, 3]
    quats: jax.Array  # [G, 4] updated shape-matching rotations


def local_step(
    x: jax.Array,
    inv_mass: jax.Array,
    mass: jax.Array,
    quats: jax.Array,
    topo: Topology,
    colls: CollisionSet,
    thickness: jax.Array,
    floor_height: jax.Array,
    rotation_iterations: int,
    reference_quirks: bool,
    strain_contiguous: bool = False,
    volume_contiguous: bool = False,
    radius: jax.Array | None = None,
    pt_full: bool = True,
    tet_flat: bool = True,
    tet_fused: bool = False,
) -> LocalStep:
    """Project every constraint type onto its manifold from the *same*
    positions — exactly the reference's local step, which reads node state
    without mutating it (``Solver.cpp:270-308``).

    ``pt_full=False`` (recentered contact coupling) skips building the
    [K, 4, 3] point-triangle projection stack — only ``point_tri_delta``
    is consumed downstream.
    """
    if topo.shape.node_idx.shape[0]:
        shape_p, quats = proj.project_shape(
            x, mass, quats, topo.shape, rotation_iterations
        )
    else:
        # No shape-matching constraints (static) — skip the projection
        # entirely.  The dummy 1-group batch (state allocates
        # max(1, groups) quats) otherwise runs extract_rotation's
        # fixed-trip loop every iteration: ~20 trips x ~100 us of pure
        # loop overhead on a [1]-group tensor, measured 9.2 ms/tick on the
        # (shape-free) mixed scene and ~2 ms on the 20x20 cloth.
        shape_p = jnp.zeros((0, 3), x.dtype)
    pt_proj, pt_delta = project_point_tri(
        x, colls.pt_idx, thickness, build_stack=pt_full,
        pt_count=jnp.sum(colls.pt_mask),
    )
    z043 = jnp.zeros((0, 4, 3), x.dtype)
    z12 = jnp.zeros((0, 12), x.dtype)
    if tet_flat:
        strain_p, volume_p = z043, z043
        if tet_fused and topo.strain.idx.shape[0]:
            # One shared SVD chain, one combined [C, 12] force buffer
            # (host-verified identical strain/volume tet lists).
            strain12 = proj.tet_force12_fused(
                x, topo.strain, topo.volume, strain_contiguous
            )
            volume12 = z12
        else:
            strain12 = (
                proj.tet_force12(x, topo.strain, "strain", strain_contiguous)
                if topo.strain.idx.shape[0] else z12
            )
            volume12 = (
                proj.tet_force12(x, topo.volume, "volume", volume_contiguous)
                if topo.volume.idx.shape[0] else z12
            )
    else:
        strain_p = proj.project_strain(x, topo.strain, strain_contiguous)
        volume_p = proj.project_volume(x, topo.volume, volume_contiguous)
        strain12, volume12 = z12, z12
    edge_proj, edge_delta = project_edge_edge(
        x, inv_mass, colls.edge_idx, thickness, reference_quirks
    )
    if colls.nn_idx.shape[0] and radius is not None:
        nn_proj = project_node_node(x, radius, inv_mass, colls.nn_idx)
    else:
        nn_proj = jnp.zeros((colls.nn_idx.shape[0], 2, 3), dtype=x.dtype)
    if colls.floor_active.shape[0]:  # dense floor mode
        static_p = project_static_dense(x, floor_height, reference_quirks)
    else:
        static_p = project_static(
            x, colls.static_idx, floor_height, reference_quirks
        )
    dd = getattr(topo, "dist_dense", None)
    if dd is not None and dd.shape[0] == topo.distance.idx.shape[0] > 0:
        dist_delta = proj.project_distance_delta_dense(x, topo.distance, dd)
    else:
        dist_delta = proj.project_distance_delta(x, topo.distance)
    return LocalStep(
        distance=dist_delta,
        position=proj.project_position(topo.position),
        strain=strain_p,
        volume=volume_p,
        strain_force12=strain12,
        volume_force12=volume12,
        bend=proj.project_bend(x, inv_mass, topo.bend),
        shape=shape_p,
        goal=proj.project_goal(topo.goal),
        point_tri=pt_proj,
        point_tri_delta=pt_delta,
        edge=edge_proj,
        edge_delta=edge_delta,
        node_node=nn_proj,
        static=static_p,
        quats=quats,
    )


def _tet_scatter_add(
    y: jax.Array, batch, vals: jax.Array, contiguous: bool
) -> jax.Array:
    """Scatter per-tet 4-node contributions; a slice-add when the layout is
    element-major (TPU scatter-adds run ~9M rows/s, slice adds at full
    bandwidth)."""
    c = batch.idx.shape[0]
    if contiguous:
        return y.at[: 4 * c].add(vals.reshape(4 * c, 3))
    return y.at[batch.idx].add(vals)


def assemble_force(
    msn_h2: jax.Array,
    local: LocalStep,
    topo: Topology,
    colls: CollisionSet,
    strain_contiguous: bool = False,
    volume_contiguous: bool = False,
    contact_coupling: str = "full",
    x: jax.Array | None = None,
    pt_diag: jax.Array | None = None,
    tet_fused: bool = False,
) -> jax.Array:
    """Global force vector: ``b = M·sₙ/h² + Σ w·AᵀB·p``
    (``Solver.cpp:266,310-349``).

    ``contact_coupling="recentered"`` keeps the point-triangle AᵀA block out
    of the CG operator (only its dense diagonal ``pt_diag`` is in the system)
    and compensates here: ``b += w·AᵀA·(p − x) + D_c·x``, whose fixed point
    over the PD iterations is identical to full coupling.  ``p − x`` is
    nonzero only in the point row, so the correction is one rank-1 scatter
    per PD iteration instead of a gather+scatter in each of the ~16 CG
    applies per iteration (TPU scatters run ~9M rows/s — the contact block
    dominated the substep at stress scale).
    """
    f = msn_h2

    # Distance: AᵀB = A = [[.5,-.5],[-.5,.5]] (Constraints.cpp:42-47).
    # Both halves ride one scatter op (per-op cost dominates row count);
    # small scenes use the dense incidence matmul instead (+half at idx0,
    # −half at idx1 = −Dᵀ·half with D = +1@idx1 −1@idx0).
    d = topo.distance
    dd = getattr(topo, "dist_dense", None)
    if d.idx.shape[0]:
        half = 0.5 * d.w[:, None] * local.distance
        if dd is not None and dd.shape[0] == d.idx.shape[0]:
            f = f - _einsum("cn,cd->nd", dd, half)
        else:
            f = f.at[d.idx.T.reshape(-1)].add(
                jnp.concatenate([half, -half], axis=0)
            )

    # Position: AᵀB = I (Constraints.cpp:70-71).  Targets are build-time
    # constants, so the whole scatter folds into one precomputed dense add
    # (Topology.position_force_dense).
    p = topo.position
    pfd = getattr(topo, "position_force_dense", None)
    if p.idx.shape[0]:
        if pfd is not None and pfd.shape[0] == f.shape[0]:
            f = f + pfd
        else:
            f = f.at[p.idx].add(p.w[:, None] * local.position)

    # Tets: Aᵀ p = Gᵀ · p[1:4] (B = I, rows 1..3 of p are F̂'s columns).
    # The flat path delivers the whole w·AᵀB·p̂ chain as [C, 12] with no
    # tile-padded intermediates (projections.tet_force12).
    tet_passes = [
        (topo.strain, local.strain, local.strain_force12, strain_contiguous),
    ]
    if not tet_fused:
        # When fused, strain_force12 already carries the combined
        # strain+volume contribution (projections.tet_force12_fused).
        tet_passes.append(
            (topo.volume, local.volume, local.volume_force12, volume_contiguous)
        )
    for batch, pl, f12, contig in tet_passes:
        if f12.shape[0]:
            c = batch.idx.shape[0]
            if contig:
                f = f.at[: 4 * c].add(f12.reshape(4 * c, 3))
            else:
                blocks = jnp.concatenate(
                    [f12[:, 3 * a : 3 * a + 3] for a in range(4)], axis=0
                )
                f = f.at[batch.idx.T.reshape(-1)].add(blocks)
        elif batch.idx.shape[0]:
            contrib = _einsum("cja,cjd->cad", batch.g3(), pl[:, 1:4, :])
            f = _tet_scatter_add(
                f, batch, batch.w[:, None, None] * contrib, contig
            )

    # Bend: AᵀB = I₄ (Constraints.cpp:390-391).
    b = topo.bend
    if b.idx.shape[0]:
        f = f.at[b.idx].add(b.w[:, None, None] * local.bend)

    # Shape / goal matching: A = B = I per member
    # (ShapeMatchingConstraint.cpp:58-71,147-160).
    for grp, pl in ((topo.shape, local.shape), (topo.goal, local.goal)):
        if grp.node_idx.shape[0]:
            wm = grp.w[grp.group_idx] * grp.member_mask
            f = f.at[grp.node_idx].add(wm[:, None] * pl)

    # Point-triangle collisions: AᵀB·p = AᵀA·p (A = B,
    # CollisionConstraint.cpp:176-194).
    if colls.pt_idx.shape[0]:
        wk = W_POINT_TRI * colls.pt_mask
        if contact_coupling == "full":
            ata = jnp.asarray(ATA_DIFF4, dtype=f.dtype)
            contrib = _einsum("ab,kbd->kad", ata, local.point_tri)
            f = f.at[colls.pt_idx].add(wk[:, None, None] * contrib)
        else:
            # Recentered: w·AᵀA·(p − x) collapses to AᵀA's first column
            # times the point displacement (the projection moves only the
            # point), plus the dense diagonal lag term D_c·x.  One flat
            # [4K, 3] scatter, 2-D throughout (no tile-padded [K,4,3]).
            col0 = ATA_DIFF4[:, 0]
            delta = local.point_tri_delta
            blocks = [
                (wk * float(col0[a]))[:, None] * delta for a in range(4)
            ]
            f = f + capped_col_scatter(
                f.shape[0], 3, colls.pt_idx, blocks, jnp.sum(colls.pt_mask)
            )
            f = f + pt_diag[:, None] * x
    elif contact_coupling != "full" and pt_diag is not None:
        f = f + pt_diag[:, None] * x

    # Edge-edge collisions: A identical to the point-tri differential
    # (CollisionConstraint.cpp:202-211), w = 1e6.
    if colls.edge_idx.shape[0]:
        we = W_EDGE * colls.edge_mask
        ata = jnp.asarray(ATA_DIFF4, dtype=f.dtype)
        if contact_coupling == "full":
            contrib = _einsum("ab,kbd->kad", ata, local.edge)
            f = f.at[colls.edge_idx].add(we[:, None, None] * contrib)
        else:
            # Recentered: all four nodes move, so use the full delta.
            contrib = _einsum("ab,kbd->kad", ata, local.edge_delta)
            f = f.at[colls.edge_idx].add(we[:, None, None] * contrib)
            # The dense D_e·x lag term rides pt_diag (host folds the edge
            # diagonal into it; see pd_substep).

    # Node-node collisions (CollisionConstraint.cpp:48-65): B = I per node,
    # so AᵀB·p is just w·p — matrix contribution is diagonal-only and rides
    # the dense static_diag in the operator.
    if colls.nn_idx.shape[0]:
        wn = W_NODE_NODE * colls.nn_mask
        f = f.at[colls.nn_idx].add(wn[:, None, None] * local.node_node)

    # Static floor collisions (CollisionConstraint.cpp:457-463).  Dense mode:
    # count · w · p per node (multiplicity folded into the multiplier).
    if colls.floor_active.shape[0]:
        wf = W_STATIC * topo.floor_count * colls.floor_active
        f = f + wf[:, None] * local.static
    else:
        ws = W_STATIC * colls.static_mask
        f = f.at[colls.static_idx].add(ws[:, None] * local.static)
    return f


def static_collision_diag(
    colls: CollisionSet,
    num_nodes: int,
    dtype,
    floor_count: jax.Array | None = None,
) -> jax.Array:
    """Dense per-node diagonal of the floor-contact constraints, built once
    per substep.  Floor contacts are diagonal-only (A = B = I per node,
    CollisionConstraint.cpp:442-445), so folding them into a dense vector
    removes an S-sized scatter from every CG apply.  In dense-floor mode the
    diagonal is count · w · active with no scatter at all."""
    if colls.floor_active.shape[0]:
        assert floor_count is not None
        return (W_STATIC * floor_count * colls.floor_active).astype(dtype)
    return jax.ops.segment_sum(
        W_STATIC * colls.static_mask, colls.static_idx, num_segments=num_nodes
    ).astype(dtype)


def point_tri_collision_diag(
    colls: CollisionSet, num_nodes: int, dtype
) -> jax.Array:
    """Dense per-node AᵀA diagonal of the point-triangle contacts (for
    ``contact_coupling="recentered"``), built once per substep."""
    wk = W_POINT_TRI * colls.pt_mask
    blocks = [
        (wk * float(ATA_DIFF4[a, a]))[:, None] for a in range(4)
    ]
    return capped_col_scatter(
        num_nodes, 1, colls.pt_idx, blocks, jnp.sum(colls.pt_mask)
    )[:, 0].astype(dtype)


def edge_collision_diag(
    colls: CollisionSet, num_nodes: int, dtype
) -> jax.Array:
    """Dense per-node AᵀA diagonal of the edge-edge contacts."""
    ata_d = jnp.asarray(ATA_DIFF4.diagonal().copy(), dtype=dtype)
    contrib = (W_EDGE * colls.edge_mask)[:, None] * ata_d[None, :]
    return jax.ops.segment_sum(
        contrib.reshape(-1), colls.edge_idx.reshape(-1), num_segments=num_nodes
    ).astype(dtype)


def node_node_diag(
    colls: CollisionSet, num_nodes: int, dtype
) -> jax.Array:
    """Dense per-node diagonal of the node-node contacts.  The reference's
    ``setupCollisionMatrix`` adds w to both diagonal entries and nothing
    else (``CollisionConstraint.cpp:41-46``), so the constraint's entire
    matrix contribution folds into the dense diagonal — zero per-CG-apply
    cost."""
    wn = W_NODE_NODE * colls.nn_mask
    contrib = jnp.broadcast_to(wn[:, None], (wn.shape[0], 2))
    return jax.ops.segment_sum(
        contrib.reshape(-1), colls.nn_idx.reshape(-1), num_segments=num_nodes
    ).astype(dtype)


def _tet_ata_flat(
    y: jax.Array, x: jax.Array, batch, w_over: jax.Array | None
) -> jax.Array:
    """``y += w·Gᵀ(G x)`` for a shared-node (non-contiguous) tet batch with
    NO tet-shaped 3-D intermediates.

    The einsum form materialized ``[C,4,3]``/``[C,3,3]`` buffers whose
    minor dims tile-pad to (8,128) — ~4 KB per tet row, ~2.5 GB EACH at the
    110k-node imported mesh's 623k tets; several live per CG trip crashed
    the TPU worker outright (round-5 finding).  Here: one ``[4C,3]`` row
    gather, one physical transpose to dense ``[3·4C]`` columns, the GᵀG
    contraction as 36 fused column FMAs, and one flat ``[3N]``
    scatter-add.  Peak transient is the [4C,3] gather (~1.3 GB at 623k) —
    bounded, and the whole apply is ~4 GB of traffic instead of ~15.
    """
    c = batch.idx.shape[0]
    n = x.shape[0]
    idx_t = batch.idx.T.reshape(-1)  # [4C]
    gx = x[idx_t]  # [4C, 3] row gather
    gxt = jax.lax.optimization_barrier(gx.T.reshape(-1))  # dense [3·4C]

    def pcol(a, d):
        return jax.lax.slice(gxt, (d * 4 * c + a * c,), (d * 4 * c + (a + 1) * c,))

    g = batch.g  # [12, C] flat, row 4j+a — dense column rows.
    gf = [[g[4 * j + a] for a in range(4)] for j in range(3)]
    w = batch.w if w_over is None else w_over
    e = [
        [
            gf[j][0] * pcol(0, d)
            + gf[j][1] * pcol(1, d)
            + gf[j][2] * pcol(2, d)
            + gf[j][3] * pcol(3, d)
            for d in range(3)
        ]
        for j in range(3)
    ]
    vals = jnp.concatenate(
        [
            w * (gf[0][a] * e[0][d] + gf[1][a] * e[1][d] + gf[2][a] * e[2][d])
            for a in range(4)
            for d in range(3)
        ]
    )  # [12C] dense
    slots = jnp.concatenate(
        [d * n + batch.idx[:, a] for a in range(4) for d in range(3)]
    )
    acc = jnp.zeros((3 * n,), x.dtype).at[slots].add(vals)
    return y + jax.lax.optimization_barrier(acc.reshape(3, n)).T


def apply_system(
    x: jax.Array,
    mass_over_h2: jax.Array,
    topo: Topology,
    colls: CollisionSet,
    strain_contiguous: bool = False,
    volume_contiguous: bool = False,
    static_diag: jax.Array | None = None,
    contact_coupling: str = "full",
    tet_shared: bool = False,
) -> jax.Array:
    """Matrix-free ``(M/h² + Σ w·AᵀA) x`` — one CG operator application."""
    if static_diag is None:
        static_diag = static_collision_diag(
            colls, x.shape[0], x.dtype, topo.floor_count
        )
        if colls.nn_idx.shape[0]:
            static_diag = static_diag + node_node_diag(colls, x.shape[0], x.dtype)
        if contact_coupling in ("diagonal", "recentered"):
            static_diag = static_diag + point_tri_collision_diag(
                colls, x.shape[0], x.dtype
            )
    y = (mass_over_h2 + static_diag)[:, None] * x

    if topo.ata_dense.shape[0] == x.shape[0]:
        # Small-scene dense operator: every static constraint term in ONE
        # MXU matmul (see Topology.ata_dense) — replaces the gather/scatter
        # chain below, whose per-op overhead dominates tiny ticks.
        y = y + _einsum("ij,jd->id", topo.ata_dense, x)
        return _apply_collision_terms(y, x, topo, colls, contact_coupling)

    d = topo.distance
    if d.idx.shape[0]:
        xa = x[d.idx[:, 0]]
        xb = x[d.idx[:, 1]]
        half = 0.5 * d.w[:, None] * (xa - xb)  # AᵀA = A for distance
        y = y.at[d.idx.T.reshape(-1)].add(
            jnp.concatenate([half, -half], axis=0)
        )

    p = topo.position
    if p.idx.shape[0]:
        y = y.at[p.idx].add(p.w[:, None] * x[p.idx])

    ell = getattr(topo, "ell_nbr", None)
    if topo.tet_band.shape[1] == x.shape[0]:
        # Element-major strain+volume blocks as one banded operator: seven
        # shifted fused multiply-adds on [N, 3], no tet-shaped intermediates
        # (see Topology.tet_band).
        band = topo.tet_band
        acc = band[3][:, None] * x
        for dd in (1, 2, 3):
            acc = acc + band[3 + dd][:, None] * jnp.roll(x, -dd, axis=0)
            acc = acc + band[3 - dd][:, None] * jnp.roll(x, dd, axis=0)
        y = y + acc
    elif ell is not None and ell.shape[0] == x.shape[0]:
        # Shared-node meshes: the ASSEMBLED strain+volume AᵀA in ELL form
        # (Topology.ell_nbr/ell_coef) — M row-gathers + FMAs on [N, ·]
        # instead of the O(C)-shaped tet gather/scatter (which moved
        # ~2.5 GB/trip at the 110k-node mesh's 623k tets).
        coef = topo.ell_coef
        acc = coef[:, 0:1] * x[ell[:, 0]]
        for mm in range(1, ell.shape[1]):
            acc = acc + coef[:, mm : mm + 1] * x[ell[:, mm]]
        y = y + acc
    else:
        passes = [
            (topo.strain, strain_contiguous, None),
            (topo.volume, volume_contiguous, None),
        ]
        if (
            tet_shared
            and topo.strain.idx.shape[0]
            and topo.volume.idx.shape[0] == topo.strain.idx.shape[0]
        ):
            # Host-verified identical strain/volume tet lists (the
            # tet_fused contract): AᵀA = (w_s + w_v)·GᵀG with one shared
            # G, so both families ride ONE gather/compute/scatter pass.
            passes = [
                (topo.strain, strain_contiguous, topo.strain.w + topo.volume.w)
            ]
        for batch, contig, w_over in passes:
            if not batch.idx.shape[0]:
                continue
            # The flat form assumes the 3 coordinate columns; the dense
            # prefactorization probes the operator with an [N, N] identity
            # (host._prepare) and keeps the einsum form.
            if contig or x.shape[1] != 3:
                xg = proj.gather_tet_nodes(x, batch, contig)  # [C,4,3]
                g3 = batch.g3()
                e = _einsum("cja,cad->cjd", g3, xg)  # G x
                contrib = _einsum("cja,cjd->cad", g3, e)  # Gᵀ (G x)
                w = batch.w if w_over is None else w_over
                y = _tet_scatter_add(
                    y, batch, w[:, None, None] * contrib, contig
                )
            else:
                y = _tet_ata_flat(y, x, batch, w_over)

    b = topo.bend
    if b.idx.shape[0]:
        y = y.at[b.idx].add(b.w[:, None, None] * x[b.idx])

    for grp in (topo.shape, topo.goal):
        if grp.node_idx.shape[0]:
            wm = grp.w[grp.group_idx] * grp.member_mask
            y = y.at[grp.node_idx].add(wm[:, None] * x[grp.node_idx])

    return _apply_collision_terms(y, x, topo, colls, contact_coupling)


def _apply_collision_terms(y, x, topo, colls, contact_coupling):
    """Dynamic (per-substep) collision blocks of the operator — shared by
    the dense and gather/scatter static paths."""
    if contact_coupling == "full":
        ata = jnp.asarray(ATA_DIFF4, dtype=x.dtype)
        if colls.pt_idx.shape[0]:
            xg = x[colls.pt_idx]
            contrib = _einsum("ab,kbd->kad", ata, xg)
            wk = W_POINT_TRI * colls.pt_mask
            y = y.at[colls.pt_idx].add(wk[:, None, None] * contrib)
        if colls.edge_idx.shape[0]:
            xe = x[colls.edge_idx]
            contrib = _einsum("ab,kbd->kad", ata, xe)
            we = W_EDGE * colls.edge_mask
            y = y.at[colls.edge_idx].add(we[:, None, None] * contrib)
    return y


def system_diag(
    mass_over_h2: jax.Array, topo: Topology, colls: CollisionSet
) -> jax.Array:
    """Jacobi preconditioner: the assembled diagonal of the PD system,
    including this substep's collision contributions
    (``Solver.cpp:179-210,242-259``)."""
    diag = mass_over_h2 + topo.stiffness_diag
    ata_d = jnp.asarray(ATA_DIFF4.diagonal().copy(), dtype=diag.dtype)  # [4]
    if colls.pt_idx.shape[0]:
        wk = W_POINT_TRI * colls.pt_mask
        blocks = [(wk * float(ATA_DIFF4[a, a]))[:, None] for a in range(4)]
        diag = diag + capped_col_scatter(
            diag.shape[0], 1, colls.pt_idx, blocks, jnp.sum(colls.pt_mask)
        )[:, 0]
    if colls.edge_idx.shape[0]:
        we = W_EDGE * colls.edge_mask
        diag = diag.at[colls.edge_idx].add(we[:, None] * ata_d[None, :])
    if colls.nn_idx.shape[0]:
        diag = diag + node_node_diag(colls, diag.shape[0], diag.dtype)
    diag = diag + static_collision_diag(
        colls, diag.shape[0], diag.dtype, topo.floor_count
    )
    return diag


def tet_block_factor(diag: jax.Array, block6: jax.Array):
    """Batched 4x4 Cholesky of the disjoint-tet system blocks.

    ``diag`` f32[N] is the full runtime system diagonal (mass/h² + static
    stiffness + this substep's contact diagonals); ``block6`` f32[6, N//4]
    the static upper off-diagonals (``Topology.tet_block6``).  Everything is
    computed on dense [K] columns — a [K, 4, 4] layout would tile-pad its
    minor dims (8, 128)/(4, 4) ≈ 64x (PLAN.md cost model).  Returns the 10
    factor columns (6 strict-lower entries + 4 reciprocal diagonals).
    """
    k = diag.shape[0] // 4
    # Physical transpose: [K, 4] keeps 4 as the (128-padded) minor dim.
    d_t = jax.lax.optimization_barrier(diag.reshape(k, 4).T)
    d0, d1, d2, d3 = d_t[0], d_t[1], d_t[2], d_t[3]
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


def tet_block_apply(factors, r: jax.Array) -> jax.Array:
    """Solve ``(L Lᵀ) z = r`` per 4-node block for the 3 stacked RHS.

    With ``factors`` from :func:`tet_block_factor` this is the EXACT inverse
    of the block-diagonal PD system — used as the CG preconditioner, it
    converges in one trip (see ``Topology.tet_block6``).
    """
    l10, l20, l30, l21, l31, l32, i00, i11, i22, i33 = factors
    n = r.shape[0]
    k = n // 4
    outs = []
    for ax in range(3):
        r_t = jax.lax.optimization_barrier(r[:, ax].reshape(k, 4).T)
        r0, r1, r2, r3 = r_t[0], r_t[1], r_t[2], r_t[3]
        y0 = r0 * i00
        y1 = (r1 - l10 * y0) * i11
        y2 = (r2 - l20 * y0 - l21 * y1) * i22
        y3 = (r3 - l30 * y0 - l31 * y1 - l32 * y2) * i33
        z3 = y3 * i33
        z2 = (y2 - l32 * z3) * i22
        z1 = (y1 - l21 * z2 - l31 * z3) * i11
        z0 = (y0 - l10 * z1 - l20 * z2 - l30 * z3) * i00
        outs.append(jnp.stack([z0, z1, z2, z3], axis=0).T.reshape(n))
    return jnp.stack(outs, axis=-1)


def pcg_solve(
    matvec,
    b: jax.Array,
    x0: jax.Array,
    diag: jax.Array,
    iterations: int,
    rtol: float = 0.0,
    inv_dense: jax.Array | None = None,
    precond_fn=None,
) -> tuple[jax.Array, jax.Array]:
    """Jacobi-preconditioned CG on the stacked 3-RHS system.

    The three axes share one Krylov space (inner products reduce over both
    axes), matching the reference's simultaneous 3-column solve
    (``Solver.cpp:356``).  ``iterations`` is the static trip cap; a nonzero
    ``rtol`` adds a data-dependent early exit once the preconditioned
    residual norm falls below ``rtol``·(initial) — shapes stay static, only
    the trip count varies, and the exit is deterministic (same data → same
    trips).  The returned residual norm feeds the observability counters
    (SURVEY §5).

    ``inv_dense`` replaces the Jacobi preconditioner with the precomputed
    dense inverse of the collision-free system (``Topology.inv_dense``) —
    the prefactorized-solve analog of the reference's LLT: exact in one
    trip on contact-free substeps, 2-3 trips under contact diagonals.
    ``precond_fn`` (a callable ``r -> z``, e.g. the disjoint-tet block
    Cholesky of :func:`tet_block_apply`) takes priority over both.
    """
    if precond_fn is not None:
        precond = precond_fn
    elif inv_dense is not None:
        precond = lambda r: _einsum("ij,jd->id", inv_dense, r)
    else:
        inv_diag = (1.0 / diag)[:, None]
        precond = lambda r: inv_diag * r

    r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    rz0 = rz

    def step(carry):
        x, r, p, rz, i = carry
        ap = matvec(p)
        p_ap = jnp.sum(p * ap)
        alpha = jnp.where(p_ap > 0, rz / jnp.maximum(p_ap, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        p = z + beta * p
        return x, r, p, rz_new, i + 1

    if rtol > 0.0:
        tol2 = rtol * rtol * rz0

        def cond(carry):
            _, _, _, rz, i = carry
            return (i < iterations) & (rz > tol2)

        x, r, _, _, _ = jax.lax.while_loop(
            cond, step, (x0, r, p, rz, jnp.int32(0))
        )
    else:
        x, r, _, _, _ = jax.lax.fori_loop(
            0, iterations, lambda _, c: step(c), (x0, r, p, rz, jnp.int32(0))
        )
    return x, jnp.sqrt(jnp.sum(r * r))
