"""Broadphase pipelines: point-triangle CCD sweep and node-node response.

These replace the two threaded sweeps of the reference —
``_parallelPointTriangleCollisions`` (``Solver.cpp:680-875``, the live PD
pipeline) and the inline PBD node-node loop (``Solver.cpp:81-130``) — with
sort-based uniform-grid passes (see :mod:`grid`) that compile into the same
XLA program as the solver step: no host round-trips, no threads.

Capacity overflows in the triangle pipeline latch the sim-failed flag, the
analog of the reference's bucket-explosion safety check
(``Solver.cpp:741-755``).  The node-node pipeline drops overflow candidates
without latching, because the reference's PBD path has no failure latch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..options import PhysicsParams, StepConfig
from .grid import aabb_cell_slots, build_grid, gather_candidates, table_size_for
from .narrowphase import point_triangle_ccd


def detect_point_tri_collisions(
    x: jax.Array,
    prev: jax.Array,
    triangles: jax.Array,
    tri_mask: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Dispatch to the configured triangle broadphase.

    * ``celllist`` (default): sorted cell list — one home-cell entry per
      triangle, neighborhood query, cell size tracking triangle extent.
      Finds a superset of the reference's candidate pairs (the reference
      silently drops triangles spanning >20 cells, ``Solver.cpp:672-674``)
      at a fraction of the sort cost.
    * ``reference``: the quirk-faithful multi-cell insertion sweep matching
      the reference's bucket semantics (world-unit cells).

    Both share the narrowphase and the compaction; the candidate-pair *set*
    is identical for scenes within the reference's caps.
    """
    if config.broadphase_mode == "reference":
        return _detect_point_tri_reference(
            x, prev, triangles, tri_mask, params, config
        )
    if config.budget.body_stride > 1 and config.body_nodes > 0:
        return _detect_point_tri_bodies_packed(
            x, prev, triangles, tri_mask, params, config
        )
    if config.budget.body_stride > 1:
        return _detect_point_tri_bodies(
            x, prev, triangles, tri_mask, params, config
        )
    return _detect_point_tri_celllist(
        x, prev, triangles, tri_mask, params, config
    )


def _detect_point_tri_bodies_packed(
    x: jax.Array,
    prev: jax.Array,
    triangles: jax.Array,
    tri_mask: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Fully packed body-pair broadphase + narrowphase.

    Requires the host-detected uniform-body layout (``StepConfig.body_nodes``
    / ``body_node_offset`` / ``body_faces``): body ``b`` owns nodes
    ``off + b·m .. off + b·m + m − 1`` and its ``e`` triangles use the same
    local corner pattern.  Then:

    * body corner positions are *reshapes* of the node arrays (zero gathers);
    * each surviving candidate body is fetched as ONE packed ``6m``-wide row
      (prev|now of all corners) — per-row gather cost on TPU is dominated by
      row count, not width;
    * each unique (corner, candidate face) pair is CCD-tested exactly once —
      unlike the per-triangle sweep (and the reference, ``Solver.cpp:777-797``)
      which re-tests a corner once per own-face sharing it, emitting up to 3
      duplicate contacts (documented divergence: one contact per geometric
      pair is better conditioned).

    Versus ``_detect_point_tri_bodies`` this removes the triangle-level
    expansion (~500k x 32-candidate gathers at stress scale, the detection
    hot spot).
    """
    budget = config.budget
    e = budget.body_stride
    m = config.body_nodes
    off = config.body_node_offset
    faces = config.body_faces
    t = triangles.shape[0]
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

    too_big = jnp.any((hi_b - lo_b) > 2.0 - margin, axis=-1) & live_b
    size_over = jnp.any(too_big)

    ins_coords, ins_valid = _insertion_slots(lo_b, hi_b, live_b)
    # Oversize items insert up to 8 corners: size the table for the
    # worst realistic entry count so aliasing never saturates buckets.
    hgrid = build_grid(ins_coords, ins_valid, table_size_for(2 * k))
    q_coords, q_valid, _ = aabb_cell_slots(
        lo_b - 1.0, hi_b, budget.max_cells_per_tri, range_cap=8
    )
    cand_b, cand_b_valid, gather_over = gather_candidates(
        hgrid,
        q_coords,
        q_valid & live_b[:, None],
        per_cell_cap=budget.max_entries_per_cell,
        budget=budget.max_candidates_per_body,
    )
    cand_b = jnp.minimum(cand_b, k - 1)

    packed_b, packed_valid = _aabb_prefilter_pack(
        cand_b, cand_b_valid, lo_b, hi_b, margin, budget.max_narrow_bodies
    )  # [K, NB]
    own_b = jnp.arange(k, dtype=jnp.int32)[:, None]
    pair_ok = packed_valid & (packed_b != own_b) & live_b[:, None]
    nb = packed_b.shape[1]

    # One packed row per body: columns 0..3m-1 = prev corners, 3m.. = now.
    bd = jnp.concatenate(
        [pb.reshape(k, 3 * m), xb.reshape(k, 3 * m)], axis=-1
    )  # [K, 6m]
    other = bd[packed_b.reshape(-1)]  # [K*NB, 6m] — THE candidate gather
    ok_flat = pair_ok.reshape(-1)

    def pcol(c):  # prev corner c of the candidate body, [K*NB, 3]
        return other[:, 3 * c : 3 * c + 3]

    def ncol(c):  # now corner c
        return other[:, 3 * m + 3 * c : 3 * m + 3 * c + 3]

    cap = budget.max_point_tri_contacts
    n_combo = m * e
    assert n_combo <= 32, "packed-body path requires m*e <= 32 combo bits"
    # Two-level compaction: per-combo cumsum+scatter over the full K·NB pair
    # axis x16 was the measured detection hot spot (~100 ms at 500k).  Pack
    # the 16 hit flags into one bitmask per PAIR (pure VPU), compact live
    # pairs once, then expand combos on the tiny packed buffer.
    bits = jnp.zeros(k * nb, jnp.uint32)
    for c in range(m):
        ap0 = jnp.repeat(pb[:, c], nb, axis=0)  # [K*NB, 3]
        ap1 = jnp.repeat(xb[:, c], nb, axis=0)
        for f, (i0, i1, i2) in enumerate(faces):
            b0, b1 = pcol(i0), ncol(i0)
            hit, _ = point_triangle_ccd(
                ap0 - b0,
                pcol(i1) - b0,
                pcol(i2) - b0,
                ap1 - b1,
                ncol(i1) - b1,
                ncol(i2) - b1,
                params.collision_threshold_distance,
            )
            bits = bits | (
                (hit & ok_flat).astype(jnp.uint32) << jnp.uint32(c * e + f)
            )
    anyhit = bits > 0
    # A contact-capped buffer always holds every live pair (pairs <= contacts).
    pos = jnp.cumsum(anyhit.astype(jnp.int32)) - 1
    dest = jnp.where(anyhit & (pos < cap), pos, cap)
    pair_buf = (
        jnp.full(cap + 1, -1, jnp.int32)
        .at[dest]
        .set(jnp.arange(k * nb, dtype=jnp.int32))[:cap]
    )
    pbits = jnp.where(pair_buf >= 0, bits[jnp.maximum(pair_buf, 0)], 0)
    combo_hit = (
        pbits[:, None] >> jnp.arange(n_combo, dtype=jnp.uint32)[None, :]
    ) & 1  # [cap, n_combo]
    flat = combo_hit.reshape(-1) > 0
    pos2 = jnp.cumsum(flat.astype(jnp.int32)) - 1
    dest2 = jnp.where(flat & (pos2 < cap), pos2, cap)
    all_ids = (
        jnp.repeat(jnp.maximum(pair_buf, 0), n_combo) * n_combo
        + jnp.tile(jnp.arange(n_combo, dtype=jnp.int32), cap)
    )
    hit_ids = (
        jnp.full(cap + 1, -1, jnp.int32).at[dest2].set(all_ids)[:cap]
    )

    # Decode (pair, corner, face) -> node tuple.
    found = hit_ids >= 0
    ids = jnp.maximum(hit_ids, 0)
    combo = ids % n_combo
    pair = ids // n_combo
    c_of = combo // e
    f_of = combo % e
    b_of = pair // nb
    s_of = pair % nb
    other_body = packed_b[b_of, s_of]
    faces_arr = jnp.asarray(np.asarray(faces, dtype=np.int32))
    a_node = off + b_of * m + c_of
    bcd = off + other_body[:, None] * m + faces_arr[f_of]
    pt_idx = jnp.concatenate([a_node[:, None], bcd], axis=-1)
    pt_idx = jnp.where(found[:, None], pt_idx, 0)
    pt_mask = found.astype(x.dtype)
    overflow = size_over | jnp.any(gather_over & live_b)
    return pt_idx, pt_mask, overflow


def _detect_point_tri_bodies(
    x: jax.Array,
    prev: jax.Array,
    triangles: jax.Array,
    tri_mask: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Body-granular cell-list broadphase for uniform-stride scenes.

    When every collision body is exactly ``stride`` contiguous triangles
    whose members pairwise share nodes (tet soups: 4 faces per tet — the
    shared-node filter already guarantees intra-body faces never collide,
    ``Solver.cpp:757-770``), broadphase insertion/gathering runs per *body*:
    random gathers shrink by ``stride`` (and the candidate gather by
    ``stride²``).  Candidate bodies surviving a body-level AABB cull expand
    *arithmetically* (contiguity) back to triangle candidates for the shared
    tri-level prefilter + CCD narrowphase.
    """
    budget = config.budget
    e = budget.body_stride
    t = triangles.shape[0]
    k = t // e
    cell = params.broadphase_cell

    lo_t, hi_t = _tri_swept_aabb(x, prev, triangles, cell)
    live_t = tri_mask > 0

    # Body AABB = reduce over its member triangles (contiguous reshape).
    big = jnp.asarray(3.0e38, x.dtype)
    lo_b = jnp.min(
        jnp.where(live_t[:, None], lo_t, big).reshape(k, e, 3), axis=1
    )
    hi_b = jnp.max(
        jnp.where(live_t[:, None], hi_t, -big).reshape(k, e, 3), axis=1
    )
    live_b = jnp.any(live_t.reshape(k, e), axis=1)
    lo_b = jnp.where(live_b[:, None], lo_b, 0.0)
    hi_b = jnp.where(live_b[:, None], hi_b, 0.0)
    margin_b = params.collision_threshold_distance / cell

    too_big = jnp.any((hi_b - lo_b) > 2.0 - margin_b, axis=-1) & live_b
    size_over = jnp.any(too_big)

    ins_coords, ins_valid = _insertion_slots(lo_b, hi_b, live_b)
    # Oversize items insert up to 8 corners: size the table for the
    # worst realistic entry count so aliasing never saturates buckets.
    hgrid = build_grid(ins_coords, ins_valid, table_size_for(2 * k))
    q_coords, q_valid, _ = aabb_cell_slots(
        lo_b - 1.0, hi_b, budget.max_cells_per_tri, range_cap=8
    )
    cand_b, cand_b_valid, gather_over = gather_candidates(
        hgrid,
        q_coords,
        q_valid & live_b[:, None],
        per_cell_cap=budget.max_entries_per_cell,
        budget=budget.max_candidates_per_body,
    )  # i32[K, Bb] body ids
    cand_b = jnp.minimum(cand_b, k - 1)

    # Body-level AABB cull + pack to the narrow-body budget.
    margin = params.collision_threshold_distance / cell
    packed_b, packed_b_valid = _aabb_prefilter_pack(
        cand_b, cand_b_valid, lo_b, hi_b, margin, budget.max_narrow_bodies
    )  # [K, NB]

    # Expand to triangle candidates: body kb -> tris kb*e .. kb*e+e-1, and
    # replicate each body's list to its member triangles (contiguous repeat,
    # not a gather).
    cand_tri = (
        packed_b[:, :, None] * e
        + jnp.arange(e, dtype=jnp.int32)[None, None, :]
    ).reshape(k, -1)  # [K, NB*e]
    valid_tri = jnp.broadcast_to(
        packed_b_valid[:, :, None], (k, packed_b_valid.shape[1], e)
    ).reshape(k, -1)
    cand_tri = jnp.repeat(cand_tri, e, axis=0)  # [T, NB*e]
    valid_tri = jnp.repeat(valid_tri, e, axis=0) & live_t[:, None]

    pt_idx, pt_mask, total = _ccd_and_compact(
        x, prev, triangles, cand_tri, valid_tri, params, config,
        lo_t, hi_t, margin,
    )
    overflow = size_over | jnp.any(gather_over & live_b)
    return pt_idx, pt_mask, overflow


def _tri_swept_aabb(x, prev, triangles, scale):
    p_now = x[triangles] / scale  # [T,3,3]
    p_prev = prev[triangles] / scale
    lo = jnp.minimum(p_now.min(axis=1), p_prev.min(axis=1))
    hi = jnp.maximum(p_now.max(axis=1), p_prev.max(axis=1))
    return lo, hi


_CORNER_OFFS = np.array(
    [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
    dtype=np.int32,
)  # [8,3]


def _insertion_slots(lo: jax.Array, hi: jax.Array, live: jax.Array):
    """Cell-list insertion slots: the home cell ``floor(lo)`` plus, on every
    axis where the item spans more than one cell, the next cell over.

    With queries covering ``[lo − 1, hi]``, single-corner insertion only
    guarantees discovery of items within one cell; for a pair where BOTH
    members span (1, 2] cells (on different axes) discovery could silently
    fail in both directions.  Two insertion corners per oversize axis close
    that hole: for any overlapping pair of ≤2-cell items, per axis the two
    insertion cells ``i, i+1`` straddle the query window bounds, and two
    integers one apart cannot both fall outside a non-empty integer range.
    Items beyond 2 cells still latch (see the too_big checks).

    Returns ``(coords i32[M, 8, 3], valid bool[M, 8])`` — duplicate corners
    on non-oversize axes are masked out, so each covered cell is inserted
    exactly once (candidate multiplicity stays 1).
    """
    home = jnp.floor(lo).astype(jnp.int32)  # [M,3]
    oversize = (hi - lo) > 1.0  # [M,3]
    offs = jnp.asarray(_CORNER_OFFS)
    coords = home[:, None, :] + offs[None]
    allowed = jnp.all((offs[None] == 0) | oversize[:, None, :], axis=-1)
    return coords, allowed & live[:, None]


def _celllist_candidates(
    x: jax.Array,
    prev: jax.Array,
    triangles: jax.Array,
    tri_mask: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Candidate stage of the sorted cell-list broadphase.

    Each triangle is inserted into its swept-AABB min-corner cell — plus the
    next cell over on any axis it spans more than one cell (see
    ``_insertion_slots``); a query enumerates the AABB's cell range expanded
    by one cell on the min side.  Discovery is symmetric for every pair of
    items up to two cells in extent; larger items latch the overflow flag
    (the analog of the reference's range-cap skip, but loud instead of
    silent).  Transiently-oversize items can appear more than once in a
    query's candidate row (once per shared insertion cell) — the same
    multiplicity the reference's per-shared-cell sweep produces
    (Solver.cpp:747-797).

    The cell size is a *traced* scalar: ``collision_cell_scale`` x the
    largest initial triangle extent, supplied via ``PhysicsParams.
    broadphase_cell`` — retunable without recompiling.

    Returns ``(cand, cand_valid, lo, hi, margin, overflow)``.
    """
    budget = config.budget
    t = triangles.shape[0]
    cell = params.broadphase_cell

    lo, hi = _tri_swept_aabb(x, prev, triangles, cell)
    live = tri_mask > 0
    margin = params.collision_threshold_distance / cell

    # Two insertion corners per oversize axis (see _insertion_slots) make
    # discovery symmetric for items up to 2 cells; beyond that (minus the
    # CCD margin the query expansion must also absorb) latch hard — the loud
    # analog of the reference's silent range-cap skip (Solver.cpp:672-674).
    too_big = jnp.any((hi - lo) > 2.0 - margin, axis=-1) & live
    size_over = jnp.any(too_big)

    ins_coords, ins_valid = _insertion_slots(lo, hi, live)
    # (see the 2x entry-count note in the packed-body path)
    hgrid = build_grid(ins_coords, ins_valid, table_size_for(2 * t))

    # Query range: AABB cells plus one on the min side.
    q_coords, q_valid, q_over = aabb_cell_slots(
        lo - 1.0, hi, budget.max_cells_per_tri, range_cap=8
    )
    q_valid = q_valid & live[:, None]

    cand, cand_valid, gather_over = gather_candidates(
        hgrid,
        q_coords,
        q_valid,
        per_cell_cap=budget.max_entries_per_cell,
        budget=budget.max_candidates_per_tri,
    )
    # Insertion is unique per (cell, triangle) — no dedup needed.
    cand = jnp.minimum(cand, t - 1)
    # Contact-buffer and query-cell overflow drop the excess gracefully
    # (re-detected next substep; far query cells are the least likely to
    # hold contacts); only oversized items and reference-scale bucket
    # explosions latch sim failure.
    del q_over
    overflow = size_over | jnp.any(gather_over & live)
    return cand, cand_valid, lo, hi, margin, overflow


def _detect_point_tri_celllist(
    x: jax.Array,
    prev: jax.Array,
    triangles: jax.Array,
    tri_mask: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Sorted cell-list point-triangle pipeline (see _celllist_candidates)."""
    cand, cand_valid, lo, hi, margin, overflow = _celllist_candidates(
        x, prev, triangles, tri_mask, params, config
    )
    pt_idx, pt_mask, total = _ccd_and_compact(
        x, prev, triangles, cand, cand_valid, params, config, lo, hi, margin
    )
    return pt_idx, pt_mask, overflow


def detect_edge_edge_collisions(
    x: jax.Array,
    prev: jax.Array,
    triangles: jax.Array,
    tri_mask: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Edge-edge collision sweep — the reference's commented-out pipeline
    (``Solver.cpp:799-823``) rebuilt: for each unordered candidate triangle
    pair from the cell-list broadphase, CCD-test the 3x3 edge combinations
    (``edgeEdgeCCD``, quirk/fixed per ``config.reference_quirks``) and emit
    ``EdgeCollisionConstraint`` node tuples (a,b | c,d).

    Each unordered pair is tested once (query id < candidate id; cell-list
    discovery is symmetric for within-budget items).  Opt-in via
    ``StepConfig.enable_edge_collisions``.

    Returns ``(edge_idx i32[E,4], edge_mask f32[E], overflow bool[])``.
    """
    from .narrowphase import edge_edge_ccd

    budget = config.budget
    t = triangles.shape[0]
    cand, cand_valid, lo, hi, margin, overflow = _celllist_candidates(
        x, prev, triangles, tri_mask, params, config
    )
    cand, cand_valid = _aabb_prefilter_pack(
        cand, cand_valid, lo, hi, margin, budget.max_narrow_candidates
    )
    tri_ids = jnp.arange(t, dtype=jnp.int32)
    nbc = cand.shape[1]
    own = triangles  # [T,3]
    other = triangles[cand.reshape(-1)]  # [T*B,3]
    own_rep = jnp.repeat(own, nbc, axis=0)
    shares = jnp.any(own_rep[:, :, None] == other[:, None, :], axis=(-1, -2))
    pair_ok = (
        cand_valid.reshape(-1)
        & ~shares
        & (cand.reshape(-1) > jnp.repeat(tri_ids, nbc))
    )

    xp = jnp.concatenate([prev, x], axis=-1)  # [N,6] (prev | now)
    own_rows = [xp[own_rep[:, k]] for k in range(3)]  # 3 x [T*B,6]
    other_rows = [xp[other[:, k]] for k in range(3)]

    edges = ((0, 1), (1, 2), (2, 0))
    cap = budget.max_edge_contacts
    hit_ids = jnp.full(cap + 1, -1, dtype=jnp.int32)
    count = jnp.int32(0)
    pair_idx = jnp.arange(t * nbc, dtype=jnp.int32)
    for e1, (i0, i1) in enumerate(edges):
        a_row, b_row = own_rows[i0], own_rows[i1]
        for e2, (j0, j1) in enumerate(edges):
            c_row, d_row = other_rows[j0], other_rows[j1]
            # Relative to edge-1 start, (prev | now) halves.
            hit, _ = edge_edge_ccd(
                b_row[:, :3] - a_row[:, :3],
                c_row[:, :3] - a_row[:, :3],
                d_row[:, :3] - a_row[:, :3],
                b_row[:, 3:] - a_row[:, 3:],
                c_row[:, 3:] - a_row[:, 3:],
                d_row[:, 3:] - a_row[:, 3:],
                quirk=config.reference_quirks,
            )
            hit = hit & pair_ok
            pos = count + jnp.cumsum(hit.astype(jnp.int32)) - 1
            dest = jnp.where(hit & (pos < cap), pos, cap)
            ids = pair_idx * 9 + (e1 * 3 + e2)
            hit_ids = hit_ids.at[dest].set(ids)
            count = count + hit.sum(dtype=jnp.int32)
    hit_ids = hit_ids[:cap]

    found = hit_ids >= 0
    ids = jnp.maximum(hit_ids, 0)
    combo = ids % 9
    pair = ids // 9
    e1_of, e2_of = combo // 3, combo % 3
    tri_of = pair // nbc
    other_tri = cand[pair // nbc, pair % nbc]
    edges_arr = jnp.asarray(np.asarray(edges, dtype=np.int32))  # [3,2]
    ab = jnp.take_along_axis(
        triangles[tri_of], edges_arr[e1_of], axis=1
    )  # [E,2]
    cd = jnp.take_along_axis(triangles[other_tri], edges_arr[e2_of], axis=1)
    edge_idx = jnp.concatenate([ab, cd], axis=-1)
    edge_idx = jnp.where(found[:, None], edge_idx, 0)
    edge_mask = found.astype(x.dtype)
    return edge_idx, edge_mask, overflow


def _detect_point_tri_reference(
    x: jax.Array,  # f32[N,3] advected positions
    prev: jax.Array,  # f32[N,3] positions at substep start
    triangles: jax.Array,  # i32[T,3]
    tri_mask: jax.Array,  # f32[T]
    params: PhysicsParams,
    config: StepConfig,
):
    """The quirk-faithful PD collision sweep (``Solver.cpp:680-875``).

    For every triangle pair sharing a covered grid cell (minus pairs with a
    common node, ``Solver.cpp:757-770``), each of the query triangle's three
    corners is CCD-tested against the other triangle
    (``Solver.cpp:777-797``); hits become ``PointTriangleCollisionConstraint``
    entries.  Pair duplication semantics match the reference: a pair is
    tested once per shared cell, and both (A,B) and (B,A) orders are swept.

    Returns ``(pt_idx i32[K,4], pt_mask f32[K], overflow bool[])``.
    """
    budget = config.budget
    t = triangles.shape[0]

    # Swept AABB over position and prevPosition of all three corners
    # (Solver.cpp:643-657).  Quirk: the reference computes the cell range on
    # *world* coordinates, never dividing by the grid scale
    # (Solver.cpp:659-670), so the triangle grid effectively has unit cells.
    scale = jnp.asarray(1.0, x.dtype) if config.reference_quirks else params.grid_spacing
    p_now = x[triangles] / scale  # [T,3,3]
    p_prev = prev[triangles] / scale
    lo = jnp.minimum(p_now.min(axis=1), p_prev.min(axis=1))
    hi = jnp.maximum(p_now.max(axis=1), p_prev.max(axis=1))

    live = tri_mask > 0
    # Insertion uses TriCompRange (range cap 50, Solver.cpp:974); queries use
    # sweptTriRange (cap 20, Solver.cpp:672).
    ins_coords, ins_valid, ins_over = aabb_cell_slots(
        lo, hi, budget.max_cells_per_tri, range_cap=50
    )
    q_coords, q_valid, q_over = aabb_cell_slots(
        lo, hi, budget.max_cells_per_tri, range_cap=20
    )
    ins_valid = ins_valid & live[:, None]
    q_valid = q_valid & live[:, None]

    hgrid = build_grid(
        ins_coords,
        ins_valid,
        min(table_size_for(t * budget.max_cells_per_tri, 1.0), 1 << 22),
    )
    cand, cand_valid, gather_over = gather_candidates(
        hgrid,
        q_coords,
        q_valid,
        per_cell_cap=budget.max_entries_per_cell,
        budget=budget.max_candidates_per_tri,
    )  # cand: i32[T,B]

    # Deduplicate candidate pairs.  The reference tests (and emits
    # constraints for) a pair once per shared grid cell (Solver.cpp:747-797
    # iterates per-cell buckets with no dedup), accidentally multiplying the
    # collision stiffness by the shared-cell count; one constraint per pair
    # is better conditioned and is the documented divergence (FIDELITY.md).
    sentinel = jnp.int32(2**31 - 1)
    cand_sorted = jnp.sort(jnp.where(cand_valid, cand, sentinel), axis=-1)
    first = jnp.concatenate(
        [
            jnp.ones((t, 1), bool),
            cand_sorted[:, 1:] != cand_sorted[:, :-1],
        ],
        axis=-1,
    )
    cand_valid = first & (cand_sorted != sentinel)
    cand = jnp.minimum(cand_sorted, t - 1)

    pt_idx, pt_mask, total = _ccd_and_compact(
        x, prev, triangles, cand, cand_valid, params, config, lo, hi, 
        params.collision_threshold_distance / scale
    )
    overflow = (
        jnp.any(ins_over & live)
        | jnp.any(q_over & live)
        | jnp.any(gather_over & live)
    )
    return pt_idx, pt_mask, overflow


def _aabb_prefilter_pack(
    cand: jax.Array,  # i32[T,B]
    cand_valid: jax.Array,  # bool[T,B]
    lo: jax.Array,  # f32[T,3] swept AABB (grid units)
    hi: jax.Array,
    margin: jax.Array,
    narrow: int,
):
    """Drop candidates whose swept AABBs don't overlap (inflated by the
    CCD threshold) and pack survivors to the front of a ``narrow`` buffer.

    Cell-neighborhood candidates outnumber true AABB overlaps ~8x in dense
    scenes; the full CCD is ~20 gathers + ~150 flops per candidate, the
    AABB test is 2 gathers — packing before the narrowphase is the win.
    """
    t, b = cand.shape
    aabb6 = jnp.concatenate([lo, hi], axis=-1)  # one 6-wide row per tri:
    # a single gather per candidate instead of two (gathers dominate).
    overlap = jnp.zeros((t, b), bool)
    chunk = 32
    for c0 in range(0, b, chunk):  # chunked to bound gather intermediates
        cc = cand[:, c0 : c0 + chunk]
        ab = aabb6[cc]  # [T,ch,6]
        ov = jnp.all(
            (ab[..., :3] <= hi[:, None] + margin)
            & (ab[..., 3:] >= lo[:, None] - margin),
            axis=-1,
        )
        overlap = overlap.at[:, c0 : c0 + chunk].set(
            ov & cand_valid[:, c0 : c0 + chunk]
        )

    cnt = jnp.cumsum(overlap.astype(jnp.int32), axis=1)  # [T,B] inclusive
    total = cnt[:, -1]
    # The p-th survivor's slot is the unique s with cnt[s] == p+1 and
    # overlap[s] (one-hot over the candidate axis) — a fused compare-select-
    # reduce, no take_along_axis gather (measured ~8 ms/tick at stress scale
    # vs ~2 ms for the select-reduce).
    ps = jnp.arange(narrow, dtype=jnp.int32)[None, None, :]
    onehot = overlap[:, :, None] & (cnt[:, :, None] == ps + 1)
    packed = jnp.sum(jnp.where(onehot, cand[:, :, None], 0), axis=1)
    packed_valid = ps[0] < jnp.minimum(total, narrow)[:, None]
    return packed, packed_valid


def _ccd_and_compact(
    x: jax.Array,
    prev: jax.Array,
    triangles: jax.Array,
    cand: jax.Array,  # i32[T,B]
    cand_valid: jax.Array,  # bool[T,B]
    params: PhysicsParams,
    config: StepConfig,
    lo: jax.Array,
    hi: jax.Array,
    margin: jax.Array,
):
    """Narrowphase + contact compaction shared by both broadphase modes.

    An AABB-overlap prefilter packs the cell-neighborhood candidates down to
    ``max_narrow_candidates`` true neighbors, then the CCD runs as a scan
    over *chunks* of the packed axis: peak memory stays O(T · chunk) — at
    stress-scene scale (500k tris) the fully-vectorized form would
    materialize multi-GB gather intermediates, while per-slot steps would
    serialize into B launches.  Hits stream into the fixed contact buffer
    (running-count compaction; a single int32 id per hit is scattered and
    decoded afterwards, keeping TPU's slowest primitive minimal).
    """
    cand, cand_valid = _aabb_prefilter_pack(
        cand, cand_valid, lo, hi, margin, config.budget.max_narrow_candidates
    )
    t, b = cand.shape
    chunk = min(8, b)
    if b % chunk:  # pad the slot axis to a chunk multiple
        pad = chunk - b % chunk
        cand = jnp.pad(cand, ((0, 0), (0, pad)))
        cand_valid = jnp.pad(cand_valid, ((0, 0), (0, pad)))
        b += pad

    # Packed (prev | now) node rows: one 6-wide gather per corner instead of
    # two 3-wide ones.
    xp = jnp.concatenate([prev, x], axis=-1)  # [N,6]
    own = triangles  # [T,3]
    cap = config.budget.max_point_tri_contacts
    tri_ids = jnp.arange(t, dtype=jnp.int32)
    own_prev = prev[own]  # [T,3,3]
    own_now = x[own]
    # Flat hit id for (tri, global candidate slot, corner); decoded after the
    # scan.  Scattering one int32 per row instead of the 5-wide tuple keeps
    # the compaction scatter (TPU's slowest primitive) minimal.
    n_chunks_total = b // chunk

    def step(carry, inp):
        hit_ids, count, chunk_i = carry
        cand_c, valid_c = inp  # [T,C], [T,C]
        # All math on flattened 2-D [T*C, 3] arrays: 3-D [T,C,3] tensors get
        # tile-padded layouts by XLA (measured ~15x memory at 500k tris).
        cand_f = cand_c.reshape(-1)  # [T*C]
        other = triangles[cand_f]  # [T*C,3]
        own_rep = jnp.repeat(own, chunk, axis=0)  # [T*C,3]
        # Skip self and shared-node pairs (Solver.cpp:757-770).
        shares = jnp.any(
            own_rep[:, :, None] == other[:, None, :], axis=(-1, -2)
        )  # [T*C]
        tri_rep = jnp.repeat(tri_ids, chunk)
        pair_ok = valid_c.reshape(-1) & ~shares & (cand_f != tri_rep)

        # CCD: each corner of the query triangle vs the candidate triangle,
        # relative to the candidate's first node (Solver.cpp:777-788).
        pb = xp[other[:, 0]]  # [T*C,6] = (prev | now)
        pc = xp[other[:, 1]]
        pd_ = xp[other[:, 2]]
        bp0, bp1 = pb[:, :3], pb[:, 3:]
        ab0 = pc[:, :3] - bp0
        ac0 = pd_[:, :3] - bp0
        ab1 = pc[:, 3:] - bp1
        ac1 = pd_[:, 3:] - bp1

        hits = []
        for corner in range(3):
            ap0 = jnp.repeat(own_prev[:, corner], chunk, axis=0) - bp0
            ap1 = jnp.repeat(own_now[:, corner], chunk, axis=0) - bp1
            hit_c, _ = point_triangle_ccd(
                ap0, ab0, ac0, ap1, ab1, ac1,
                params.collision_threshold_distance,
            )  # [T*C]
            hits.append(hit_c & pair_ok)
        hit = jnp.stack(hits, axis=-1)  # [T*C,3]

        flat_hit = hit.reshape(-1)  # [T*C*3]
        pos = count + jnp.cumsum(flat_hit.astype(jnp.int32)) - 1
        dest = jnp.where(flat_hit & (pos < cap), pos, cap)  # cap = dump slot
        # id encodes (t, global slot b, corner) = (t*B + chunk_i*C + c)*3 + k
        ids = (
            (
                (tri_rep * b + chunk_i * chunk
                 + jnp.tile(jnp.arange(chunk, dtype=jnp.int32), t))[:, None]
            )
            * 3
            + jnp.arange(3, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        hit_ids = hit_ids.at[dest].set(ids)
        count = count + flat_hit.sum(dtype=jnp.int32)
        return (hit_ids, count, chunk_i + 1), None

    init = (
        jnp.full(cap + 1, -1, dtype=jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    cand_chunks = cand.reshape(t, n_chunks_total, chunk).transpose(1, 0, 2)
    valid_chunks = cand_valid.reshape(t, n_chunks_total, chunk).transpose(1, 0, 2)
    (hit_ids, total, _), _ = jax.lax.scan(
        step, init, (cand_chunks, valid_chunks)
    )
    hit_ids = hit_ids[:cap]

    # Decode ids (constant-divisor div/mod lowers to multiply-shift).
    found = hit_ids >= 0
    ids = jnp.maximum(hit_ids, 0)
    corner = ids % 3
    tb = ids // 3
    tri_of = tb // b
    slot_of = tb % b
    a_node = triangles[tri_of, corner]
    other_tri = cand[tri_of, slot_of]
    bcd = triangles[other_tri]
    pt_idx = jnp.concatenate([a_node[:, None], bcd], axis=-1)
    pt_idx = jnp.where(found[:, None], pt_idx, 0)
    pt_mask = found.astype(x.dtype)
    return pt_idx, pt_mask, total


def _node_pair_candidates(
    state,
    x: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Shared node-node broadphase: sorted grid over node AABBs
    (``NodeCompRange``, ``Solver.cpp:877-901``), deduplicated candidates.

    Used by both the live PBD response (``Solver.cpp:81-130``) and the
    rebuilt PD generation sweep (``Solver.cpp:509-607``) — the reference
    feeds both from the same ``_spatialHashNodes``.

    Returns ``(cand i32[N,B], ok bool[N,B])`` where ``ok`` marks deduped
    unordered pairs (``cand > i``) of live nodes.
    """
    budget = config.budget
    n = x.shape[0]
    live = state.node_mask > 0

    r_grid = (state.radius + 0.5) / params.grid_spacing  # radiusPadding 0.5
    center = x / params.grid_spacing
    lo = center - r_grid[:, None]
    hi = center + r_grid[:, None]
    coords, valid, _ = aabb_cell_slots(
        lo, hi, budget.max_cells_per_node, range_cap=50
    )
    valid = valid & live[:, None]

    hgrid = build_grid(
        coords,
        valid,
        min(table_size_for(n * budget.max_cells_per_node, 1.0), 1 << 22),
    )
    cand, cand_valid, _ = gather_candidates(
        hgrid,
        coords,
        valid,
        per_cell_cap=budget.max_entries_per_cell,
        budget=budget.max_candidates_per_node,
    )  # [N,B]

    # Deduplicate: a neighbor covering k shared cells appears k times in the
    # gather.  The reference processes those duplicates *sequentially*, so
    # after the first push the pair no longer overlaps and the remaining
    # k−1 are no-ops (Solver.cpp:95-99); under Jacobi accumulation they
    # would instead stack k pushes.  One entry per neighbor is the faithful
    # equivalent.
    sentinel = jnp.int32(2**31 - 1)
    cand_sorted = jnp.sort(jnp.where(cand_valid, cand, sentinel), axis=-1)
    first = jnp.concatenate(
        [
            jnp.ones((n, 1), bool),
            cand_sorted[:, 1:] != cand_sorted[:, :-1],
        ],
        axis=-1,
    )
    cand_valid = first & (cand_sorted != sentinel)
    cand = jnp.minimum(cand_sorted, n - 1)

    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    ok = cand_valid & (cand > i_idx) & live[:, None] & live[cand]
    return cand, ok


def detect_node_node_pairs(
    state,
    x: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """PD node-node constraint generation — the reference's dormant
    ``_parallelComputeCollisions`` sweep (``Solver.cpp:509-607``) rebuilt.

    Every unordered pair of live nodes sharing a grid cell becomes one
    ``CollisionConstraint`` entry (the reference emits a pair per shared
    bucket with ``node.id > other.id`` and *no* overlap test — the
    projection itself no-ops on non-overlapping pairs,
    ``CollisionConstraint.cpp:22-24``).  Pairs beyond the contact budget are
    dropped gracefully (re-detected next substep); the reference path has no
    failure latch.

    Returns ``(nn_idx i32[P,2], nn_mask f32[P])``.
    """
    cand, ok = _node_pair_candidates(state, x, params, config)
    n, bwidth = cand.shape
    cap = config.budget.max_node_node_contacts

    flat = ok.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    dest = jnp.where(flat & (pos < cap), pos, cap)
    ids = jnp.arange(n * bwidth, dtype=jnp.int32)
    slot_ids = jnp.full(cap + 1, -1, dtype=jnp.int32).at[dest].set(ids)
    slot_ids = slot_ids[:cap]

    found = slot_ids >= 0
    sid = jnp.maximum(slot_ids, 0)
    i_of = sid // bwidth
    j_of = cand[i_of, sid % bwidth]
    nn_idx = jnp.stack([i_of, j_of], axis=-1)
    nn_idx = jnp.where(found[:, None], nn_idx, 0)
    return nn_idx, found.astype(x.dtype)


def pbd_node_node_response(
    state,
    x: jax.Array,
    vel: jax.Array,
    params: PhysicsParams,
    config: StepConfig,
):
    """Inline node-node collision response + friction impulses
    (``Solver.cpp:81-130``), Jacobi-accumulated over the sorted grid.

    Matches the reference's pair semantics: every node sweeps the buckets its
    padded AABB covers (``NodeCompRange``, ``Solver.cpp:877-901``), so each
    overlapping pair is processed from both sides and once per shared cell —
    the response below accumulates exactly those contributions.  The 0.85
    relaxation and mass weighting are the reference's
    (``Solver.cpp:106-110``).
    """
    live = state.node_mask > 0
    cand, ok = _node_pair_candidates(state, x, params, config)

    # Process each unordered pair once, moving both nodes.  The reference
    # sweeps both directions sequentially: the first visit resolves the
    # overlap (0.85 of it) and the second sees what's left (~0.15) —
    # net ≈ 0.98 of the overlap.  A single symmetric 0.85 push is the
    # Jacobi equivalent; double-counting both directions would apply 1.7x
    # and explode piles.
    xi = x[:, None, :]
    xj = x[cand]
    diff = xj - xi
    dist = jnp.linalg.norm(diff, axis=-1)
    disp = state.radius[:, None] + state.radius[cand] - dist
    touching = ok & (disp > 0.0)

    dir_ = jnp.where(
        (dist > 1e-5)[..., None],
        diff / jnp.maximum(dist, 1e-20)[..., None],
        jnp.array([1.0, 0.0, 0.0], x.dtype),
    )
    im_i = state.inv_mass[:, None]
    im_j = state.inv_mass[cand]
    w_sum = jnp.maximum(im_i + im_j, 1e-20)

    push = jnp.where(touching[..., None], 0.85 * disp[..., None] * dir_, 0.0)
    dx_i = jnp.sum(-push * (im_i / w_sum)[..., None], axis=1)  # [N,3]
    dx_j_contrib = push * (im_j / w_sum)[..., None]  # [N,B,3]
    dx = dx_i.at[cand.reshape(-1)].add(
        dx_j_contrib.reshape(-1, 3)
    )

    # Friction impulses (Solver.cpp:113-125).
    rel = vel[cand] - vel[:, None, :]
    perp = rel - jnp.sum(rel * dir_, axis=-1, keepdims=True) * dir_
    friction = jnp.where(
        jnp.linalg.norm(perp, axis=-1) < params.static_friction_threshold,
        1.0,
        params.friction,
    )
    imp = jnp.where(touching[..., None], friction[..., None] * perp, 0.0)
    dv_i = jnp.sum(-imp * (im_i / w_sum)[..., None], axis=1)
    dv = dv_i.at[cand.reshape(-1)].add(
        (imp * (im_j / w_sum)[..., None]).reshape(-1, 3)
    )

    return x + dx * live[:, None], vel + dv * live[:, None], jnp.asarray(False)
