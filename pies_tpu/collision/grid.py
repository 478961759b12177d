"""Sort-based uniform-grid broadphase.

The reference's broadphase is a ``phmap::parallel_flat_hash_map`` spatial
hash filled by 16 hard-coded threads (``SpatialHash.h:129-189``).  The
TPU-native replacement (SURVEY §2.7 item 5) is sort-based and fully static:

1. every item expands to ≤ ``cells_cap`` (cell, item) entries over the grid
   cells its AABB covers;
2. entries are keyed by the reference's exact cell hash
   (``(x·92837111) ^ (y·689287499) ^ (z·283923481)``, ``SpatialHash.h:28-34``)
   and sorted — one XLA sort replaces all hashmap insertion;
3. a query for a cell is two binary searches over the sorted keys, and a
   fixed per-item candidate budget is gathered by rank (dense packing via a
   per-item cumulative count, so budget slots are not wasted on empty cells).

Hash aliasing between distinct cells only adds spurious candidates — every
downstream narrowphase test re-checks geometry — so no cell-id verification
is needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EMPTY_KEY = jnp.uint32(0xFFFFFFFF)


def cell_hash(cx: jax.Array, cy: jax.Array, cz: jax.Array) -> jax.Array:
    """The reference's spatial-hash function (``SpatialHash.h:28-34``),
    computed in uint32 (the reference XORs int64 products; the low 32 bits
    carry all the mixing)."""
    ux = cx.astype(jnp.uint32) * jnp.uint32(92837111)
    uy = cy.astype(jnp.uint32) * jnp.uint32(689287499)
    uz = cz.astype(jnp.uint32) * jnp.uint32(283923481)
    h = jnp.bitwise_xor(jnp.bitwise_xor(ux, uy), uz)
    # Keep the all-ones key reserved for masked entries.
    return jnp.where(h == _EMPTY_KEY, jnp.uint32(0xFFFFFFFE), h)


class HashGrid(NamedTuple):
    """Sorted (key, item) table over all (item, covered-cell) entries."""

    sorted_keys: jax.Array  # u32[E]
    sorted_items: jax.Array  # i32[E]


def aabb_cell_slots(
    lo: jax.Array,  # f32[M, 3] AABB min (already in grid units)
    hi: jax.Array,  # f32[M, 3] AABB max (grid units)
    cells_cap: int,
    range_cap: int,
):
    """Enumerate the grid cells covered by each AABB into ``cells_cap``
    static slots.

    Follows ``sweptTriRange`` (``Solver.cpp:639-677``): ``min = floor(lo)``,
    per-axis length ``ceil(hi) − floor(lo)``; a range longer than
    ``range_cap`` on any axis yields an *empty* range (the reference returns
    ``{}``, silently skipping the item, ``Solver.cpp:672-674``).

    Returns ``(cell_coords i32[M, cells_cap, 3], valid bool[M, cells_cap],
    overflow bool[M])`` where ``overflow`` flags items whose (capped) cell
    count exceeds ``cells_cap`` — the analog of the reference's
    bucket-explosion latch (``Solver.cpp:741-745``).
    """
    base = jnp.floor(lo).astype(jnp.int32)  # [M,3]
    length = (jnp.ceil(hi) - jnp.floor(lo)).astype(jnp.int32)
    length = jnp.maximum(length, 1)
    in_cap = jnp.all(length <= range_cap, axis=-1)
    length = jnp.where(in_cap[:, None], length, 0)

    total = length[:, 0] * length[:, 1] * length[:, 2]
    overflow = total > cells_cap

    s = jnp.arange(cells_cap, dtype=jnp.int32)[None, :]  # [1,S]
    lyz = jnp.maximum(length[:, 1] * length[:, 2], 1)[:, None]
    lz = jnp.maximum(length[:, 2], 1)[:, None]
    dx = s // lyz
    rem = s % lyz
    dy = rem // lz
    dz = rem % lz
    valid = s < jnp.minimum(total, cells_cap)[:, None]
    coords = base[:, None, :] + jnp.stack([dx, dy, dz], axis=-1)
    return coords, valid, overflow


def build_grid(
    cell_coords: jax.Array,  # i32[M, S, 3]
    valid: jax.Array,  # bool[M, S]
) -> HashGrid:
    """Sort all (cell, item) entries by cell hash."""
    m, s, _ = cell_coords.shape
    keys = cell_hash(
        cell_coords[..., 0], cell_coords[..., 1], cell_coords[..., 2]
    )
    keys = jnp.where(valid, keys, _EMPTY_KEY).reshape(m * s)
    items = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, s)
    ).reshape(m * s)
    order = jnp.argsort(keys)
    return HashGrid(sorted_keys=keys[order], sorted_items=items[order])


def gather_candidates(
    grid: HashGrid,
    query_coords: jax.Array,  # i32[M, S, 3] cells each item queries
    query_valid: jax.Array,  # bool[M, S]
    per_cell_cap: int,
    budget: int,
    hard_cap: int = 1000,
):
    """Densely gather up to ``budget`` candidate items per query item.

    For each queried cell, ``searchsorted`` yields its entry range in the
    sorted table; ranges are packed back-to-back via a per-item cumulative
    count so the budget is spent only on occupied cells.

    Exceeding ``per_cell_cap`` or ``budget`` degrades gracefully — excess
    candidates are dropped, exactly as over-dense regions are already
    redundantly constrained — while ``hard_cap`` reproduces the reference's
    failure semantics (it only latches ``_simFailed`` when a bucket exceeds
    1000 entries or a sweep touches 1000 buckets, ``Solver.cpp:741-755``).

    Returns ``(candidates i32[M, budget], cand_valid bool[M, budget],
    overflow bool[M])``.
    """
    m, s, _ = query_coords.shape
    keys = cell_hash(
        query_coords[..., 0], query_coords[..., 1], query_coords[..., 2]
    )
    keys = jnp.where(query_valid, keys, _EMPTY_KEY)

    flat = keys.reshape(m * s)
    start = jnp.searchsorted(grid.sorted_keys, flat, side="left").reshape(m, s)
    end = jnp.searchsorted(grid.sorted_keys, flat, side="right").reshape(m, s)
    count = jnp.where(query_valid, end - start, 0)
    cell_overflow = count > hard_cap
    count = jnp.minimum(count, per_cell_cap)

    offsets = jnp.cumsum(count, axis=-1)  # [M,S] inclusive
    total = offsets[:, -1]
    overflow = jnp.any(cell_overflow, axis=-1) | (total > hard_cap)

    b = jnp.arange(budget, dtype=jnp.int32)[None, :]  # [1,B]
    # Which cell does budget slot b fall into? First cell whose inclusive
    # cumsum exceeds b.
    cell_of_b = jax.vmap(
        lambda offs, bb: jnp.searchsorted(offs, bb, side="right")
    )(offsets, jnp.broadcast_to(b, (m, budget)))
    cell_of_b = jnp.minimum(cell_of_b, s - 1)
    prev_off = jnp.where(
        cell_of_b > 0,
        jnp.take_along_axis(offsets, jnp.maximum(cell_of_b - 1, 0), axis=-1),
        0,
    )
    within = b - prev_off
    entry = jnp.take_along_axis(start, cell_of_b, axis=-1) + within
    cand_valid = b < jnp.minimum(total, budget)[:, None]
    entry = jnp.clip(entry, 0, grid.sorted_items.shape[0] - 1)
    candidates = grid.sorted_items[entry]
    return candidates, cand_valid, overflow
