"""Sort-based uniform-grid broadphase with a direct-address bucket table.

The reference's broadphase is a ``phmap::parallel_flat_hash_map`` spatial
hash filled by 16 hard-coded threads (``SpatialHash.h:129-189``).  The
TPU-native replacement (SURVEY §2.7 item 5) is sort + direct addressing:

1. every item expands to (cell, item) entries over the grid cells its AABB
   covers (one home cell in cell-list mode);
2. entries are keyed by the reference's exact cell hash
   (``(x·92837111) ^ (y·689287499) ^ (z·283923481)``, ``SpatialHash.h:28-34``)
   masked into a power-of-two table, and sorted once — replacing all hashmap
   insertion;
3. bucket (start, count) tables are scatter-built over the table slots, so a
   cell query is two *gathers* — no binary search.  (``jnp.searchsorted``
   lowers to a serial bisection on TPU and measured ~100x slower than direct
   addressing at stress-scene query counts.)

Hash aliasing (two cells sharing a table slot) merges buckets and only adds
spurious candidates — every downstream narrowphase test re-checks geometry —
so no cell-id verification is needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EMPTY_KEY = jnp.uint32(0xFFFFFFFF)


def table_size_for(num_items: int, load_factor: float = 0.5) -> int:
    """Static power-of-two table size targeting the given load factor."""
    need = max(16, int(num_items / max(load_factor, 1e-3)))
    return 1 << (need - 1).bit_length()


def cell_hash(cx: jax.Array, cy: jax.Array, cz: jax.Array) -> jax.Array:
    """The reference's spatial-hash function (``SpatialHash.h:28-34``),
    computed in uint32 (the reference XORs int64 products; the low 32 bits
    carry all the mixing)."""
    ux = cx.astype(jnp.uint32) * jnp.uint32(92837111)
    uy = cy.astype(jnp.uint32) * jnp.uint32(689287499)
    uz = cz.astype(jnp.uint32) * jnp.uint32(283923481)
    return jnp.bitwise_xor(jnp.bitwise_xor(ux, uy), uz)


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
    count exceeds ``cells_cap``.
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
    # Integer div/mod by a dynamic divisor lowers terribly on TPU (no native
    # integer divide); with s < 2^12 and divisors >= 1 the f32 reciprocal
    # trick is exact: floor((s+0.5)/d) == s // d for integers.
    dx = _idiv(s, lyz)
    rem = s - dx * lyz
    dy = _idiv(rem, lz)
    dz = rem - dy * lz
    valid = s < jnp.minimum(total, cells_cap)[:, None]
    coords = base[:, None, :] + jnp.stack([dx, dy, dz], axis=-1)
    return coords, valid, overflow


def _idiv(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact ``a // b`` for small non-negative int32 via f32 arithmetic."""
    return jnp.floor(
        (a.astype(jnp.float32) + 0.5) / b.astype(jnp.float32)
    ).astype(jnp.int32)


class HashGrid(NamedTuple):
    """Sorted entries plus direct-address bucket tables.

    ``bucket_table`` has one extra slot (index ``H``) that absorbs masked
    entries and invalid queries.  Each slot packs (start, count) into one
    int32 — start in bits 0..23, count saturated at 127 in bits 24..30 — so
    a cell query costs ONE gather (random gathers are the dominant cost on
    TPU, ~32M rows/s).  Entry counts above 2^24 fall back to an unpacked
    pair of tables.
    """

    sorted_items: jax.Array  # i32[E]
    bucket_table: jax.Array  # i32[H+1] packed, or None
    bucket_start: jax.Array | None  # i32[H+1] (fallback only)
    bucket_count: jax.Array | None

    @property
    def num_slots(self) -> int:
        return self.bucket_table.shape[0] - 1


def build_grid(
    cell_coords: jax.Array,  # i32[M, S, 3]
    valid: jax.Array,  # bool[M, S]
    table_size: int,
) -> HashGrid:
    """Sort all (cell, item) entries by table slot and build the tables."""
    m, s, _ = cell_coords.shape
    e = m * s
    h = table_size
    slot = (
        cell_hash(cell_coords[..., 0], cell_coords[..., 1], cell_coords[..., 2])
        & jnp.uint32(h - 1)
    ).astype(jnp.int32)
    slot = jnp.where(valid, slot, h).reshape(e)
    items = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, s)
    ).reshape(e)

    # Multi-operand sort carries the payload through the sort network —
    # measured ~13 ms/tick cheaper at 1M entries than argsort + two
    # 1M-row gathers (the gathers ran at ~140M rows/s).
    sorted_slots, sorted_items = jax.lax.sort((slot, items), num_keys=1)

    def tables(rows):
        def fn(_):
            ss = sorted_slots[:rows]
            bc = jnp.zeros(h + 1, dtype=jnp.int32).at[ss].add(
                1, mode="drop"
            )
            # Entries are sorted by slot, so each bucket's start is the
            # number of entries in lower slots — an exclusive cumsum over
            # the count table replaces the per-entry scatter-max (+ the
            # first-of-run compare chain) at ~1/4 the cost.
            bs = jnp.cumsum(bc) - bc
            return bs, bc

        return fn

    # Masked entries (slot = h) sort to the tail, so the table scatters only
    # need the valid prefix — scatter cost on TPU scales with input rows,
    # and typical occupancy is 1-3 of the 8 static insertion slots per item.
    # A two-level lax.cond picks the smallest sufficient prefix at runtime.
    num_valid = jnp.sum(valid.astype(jnp.int32))
    if e >= 1 << 17:
        bucket_start, bucket_count = jax.lax.cond(
            num_valid <= e // 4,
            tables(e // 4),
            lambda _: jax.lax.cond(
                num_valid <= e // 2, tables(e // 2), tables(e), None
            ),
            None,
        )
    else:
        bucket_start, bucket_count = tables(e)(None)
    bucket_count = bucket_count.at[h].set(0)
    if e < (1 << 24):
        packed = bucket_start | (jnp.minimum(bucket_count, 127) << 24)
        return HashGrid(
            sorted_items=sorted_items,
            bucket_table=packed,
            bucket_start=None,
            bucket_count=None,
        )
    return HashGrid(
        sorted_items=sorted_items,
        bucket_table=bucket_start,  # num_slots source; unpacked fallback
        bucket_start=bucket_start,
        bucket_count=bucket_count,
    )


def _lookup_i32(table: jax.Array, idx: jax.Array, width: int = 32) -> jax.Array:
    """Scalar table lookup as a two-level row-gather + one-hot lane select.

    A direct ``table[idx]`` lowers to per-element gathers (~140M rows/s
    measured on v5e); gathering ``width``-wide rows and selecting the lane
    with an integer one-hot mul-sum is far faster at broadphase query
    counts.  The pattern is HBM-traffic-bound (row bytes x 2 passes: the
    gather write + the select-reduce read), so narrower rows win as long as
    the gather stays traffic-bound: in-tick A/B at 500k (4M+3M lookups)
    measured 128-wide rows ~17 ms/tick vs 32-wide ~5 ms.
    ``table`` is i32[H]; ``idx`` any shape with values in [0, H).
    """
    h = table.shape[0]
    pad = (-h) % width
    if pad:
        table = jnp.concatenate([table, jnp.zeros(pad, table.dtype)])
    shift = width.bit_length() - 1
    # Flatten multi-dim queries: a [K, S] lookup keeps S as the minor dim of
    # every intermediate, tile-padding 128/S x — measured 2.1x slower than
    # the flat form at broadphase query shapes ([125k, 8]: 6.6 vs 3.1 ms).
    shape = idx.shape
    idx = idx.reshape(-1)
    rows = table.reshape(-1, width)[idx >> shift]  # [M, width]
    lane = idx & (width - 1)
    oh = (lane[:, None] == jnp.arange(width, dtype=jnp.int32)).astype(
        table.dtype
    )
    return jnp.sum(rows * oh, axis=-1).reshape(shape)


def _rank_and_prev(offsets: jax.Array, budget: int, start: jax.Array):
    """For each budget slot b: the cumulative offset of the cell it falls
    into and that cell's bucket start.  Computed as fused compare-reduces
    over the cell axis — pure VPU work, no gathers (a bisection via
    ``take_along_axis`` measured ~10x slower on TPU, and even the final
    ``take_along_axis(start, cell_of_b)`` measured 29 ms/tick at stress
    scale vs ~5 ms for the one-hot select-reduce).

    ``offsets``: i32[M, S] nondecreasing per row; ``start``: i32[M, S].
    Returns ``(start_of_b i32[M, B], prev_off i32[M, B])`` where
    ``start_of_b`` is the bucket start of slot b's cell (cell index =
    count of inclusive cumulative cell counts <= b; its one-hot is
    ``prev-le minus le`` shifted — expressed directly as the transition
    mask below).
    """
    b = jnp.arange(budget, dtype=jnp.int32)[None, None, :]  # [1,1,B]
    le = offsets[:, :, None] <= b  # [M,S,B], fused into the reduces below
    # offsets is nondecreasing, so the largest offset <= b is the cumulative
    # count before slot b's cell.
    prev_off = jnp.max(jnp.where(le, offsets[:, :, None], 0), axis=1)
    # Slot b falls in cell c = (number of s with offsets[s] <= b); the
    # one-hot of c over the cell axis is the first s with offsets[s] > b,
    # i.e. the NOT-le position whose predecessor is le (le is monotone
    # along s: a prefix of ones).
    le_prev = jnp.concatenate(
        [jnp.ones_like(le[:, :1]), le[:, :-1]], axis=1
    )
    onehot = le_prev & ~le  # [M,S,B], exactly one per (m,b) or none (c==S)
    start_of_b = jnp.sum(
        jnp.where(onehot, start[:, :, None], 0), axis=1
    )
    return start_of_b, prev_off


def query_buckets(
    grid: HashGrid,
    query_coords: jax.Array,  # i32[M, S, 3] cells each item queries
    query_valid: jax.Array,  # bool[M, S]
    per_cell_cap: int,
    hard_cap: int = 1000,
):
    """Bucket (start, count) lookups for every queried cell, width-adaptive.

    The static query width ``S`` is sized for the worst case (fast-moving
    items covering many cells) but the *live* width — the highest valid slot
    index across all rows this tick — is typically a quarter of it for
    settled scenes.  Table-lookup cost on TPU is HBM traffic of the one-hot
    row selects (~128·4 B per lookup), so a two-level ``lax.cond`` runs the
    lookups at the smallest sufficient width and pads the (start, count)
    tables back to ``S`` with empty cells.  The predicate uses the highest
    valid *index* (not the count), so rows whose valid mask is not a prefix
    truncate losslessly too.

    Returns ``(start i32[M,S], offsets i32[M,S] inclusive, total i32[M],
    overflow bool[M])``.
    """
    m, s, _ = query_coords.shape
    h = grid.num_slots
    slot = (
        cell_hash(
            query_coords[..., 0], query_coords[..., 1], query_coords[..., 2]
        )
        & jnp.uint32(h - 1)
    ).astype(jnp.int32)
    slot = jnp.where(query_valid, slot, h)

    def lookup(s_eff):
        def fn(_):
            sl = slot[:, :s_eff]
            if grid.bucket_start is None:
                packed = _lookup_i32(grid.bucket_table, sl)
                st = packed & ((1 << 24) - 1)
                ct = packed >> 24  # saturated at 127
                # The reference latches at >1000 entries/bucket; the packed
                # table saturates counts at 127, so the latch fires at >=127
                # — stricter, but only for absurd densities (per-cell use
                # caps are <=32).
                cell_over = ct >= 127
            else:
                st = grid.bucket_start[sl]
                ct = grid.bucket_count[sl]
                cell_over = ct > hard_cap
            ct = jnp.minimum(ct, per_cell_cap)
            over = jnp.any(cell_over, axis=-1)
            if s_eff < s:
                pad = ((0, 0), (0, s - s_eff))
                st = jnp.pad(st, pad)
                ct = jnp.pad(ct, pad)
            return st, ct, over

        return fn

    if s >= 16:
        # Highest live slot index this tick: truncating to any width above
        # it drops only invalid (empty) cells.
        width = jnp.max(
            jnp.where(query_valid, jnp.arange(s, dtype=jnp.int32)[None, :], -1)
        ) + 1
        start, count, overflow = jax.lax.cond(
            width <= s // 4,
            lookup(s // 4),
            lambda _: jax.lax.cond(
                width <= s // 2, lookup(s // 2), lookup(s), None
            ),
            None,
        )
    else:
        start, count, overflow = lookup(s)(None)

    offsets = jnp.cumsum(count, axis=-1)  # [M,S] inclusive
    total = offsets[:, -1]
    overflow = overflow | (total > hard_cap)
    return start, offsets, total, overflow


def gather_entries(
    grid: HashGrid,
    start: jax.Array,  # i32[M, S] bucket starts (from query_buckets)
    offsets: jax.Array,  # i32[M, S] inclusive cumulative counts
    total: jax.Array,  # i32[M]
    budget: int,
):
    """Gather up to ``budget`` candidate items per query row from the sorted
    entry table, ranges packed back-to-back so the budget is spent only on
    occupied cells.  Fixed width — callers pick ``budget`` (possibly under a
    ``lax.cond`` keyed on ``max(min(total, B))``) and pad if needed.

    Returns ``(candidates i32[M, budget], cand_valid bool[M, budget])``.
    """
    m = start.shape[0]
    b = jnp.broadcast_to(
        jnp.arange(budget, dtype=jnp.int32)[None, :], (m, budget)
    )
    start_of_b, prev_off = _rank_and_prev(offsets, budget, start)
    within = b - prev_off
    entry = start_of_b + within
    cand_valid = b < jnp.minimum(total, budget)[:, None]
    entry = jnp.clip(entry, 0, grid.sorted_items.shape[0] - 1)
    candidates = _lookup_i32(grid.sorted_items, entry)
    return candidates, cand_valid


def gather_candidates(
    grid: HashGrid,
    query_coords: jax.Array,  # i32[M, S, 3] cells each item queries
    query_valid: jax.Array,  # bool[M, S]
    per_cell_cap: int,
    budget: int,
    hard_cap: int = 1000,
):
    """Densely gather up to ``budget`` candidate items per query item.

    Each queried cell's (start, count) comes from the direct-address tables;
    ranges are packed back-to-back via a per-item cumulative count so the
    budget is spent only on occupied cells.

    Exceeding ``per_cell_cap`` or ``budget`` degrades gracefully — excess
    candidates are dropped, exactly as over-dense regions are already
    redundantly constrained — while ``hard_cap`` reproduces the reference's
    failure semantics (it only latches ``_simFailed`` when a bucket exceeds
    1000 entries or a sweep touches 1000 buckets, ``Solver.cpp:741-755``).

    Both the cell-lookup width and the entry-gather width adapt to the live
    tick via two-level ``lax.cond``s (see ``query_buckets``); outputs keep
    the static ``budget`` width.

    Returns ``(candidates i32[M, budget], cand_valid bool[M, budget],
    overflow bool[M])``.
    """
    start, offsets, total, overflow = query_buckets(
        grid, query_coords, query_valid, per_cell_cap, hard_cap
    )

    def entries(b_eff):
        def fn(_):
            cand, valid = gather_entries(grid, start, offsets, total, b_eff)
            if b_eff < budget:
                pad = ((0, 0), (0, budget - b_eff))
                cand = jnp.pad(cand, pad)
                valid = jnp.pad(valid, pad)
            return cand, valid

        return fn

    if budget >= 16:
        max_total = jnp.max(jnp.minimum(total, budget))
        candidates, cand_valid = jax.lax.cond(
            max_total <= budget // 2, entries(budget // 2), entries(budget), None
        )
    else:
        candidates, cand_valid = entries(budget)(None)
    return candidates, cand_valid, overflow
