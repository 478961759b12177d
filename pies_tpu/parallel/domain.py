"""Spatial domain decomposition: one big scene sharded over a device mesh.

The reference has no distributed story at all (SURVEY §2.8 — its only
parallelism is intra-process CPU threads, ``Solver.cpp:558-566``).  This is
the new-scope capability for scenes beyond one chip: particles are sharded
into spatial *slabs* along one axis, each device owns a contiguous block of
``L`` (renumbered) nodes plus ``B`` halo copies of each neighbor's boundary
band, and the whole PD substep runs under ``shard_map``:

* **Halo refresh** (2 ``ppermute``s): before every operator application each
  device receives the current positions of its neighbors' boundary bands.
* **Halo reduce** (2 ``ppermute``s): constraint contributions scattered into
  halo slots are returned to the owning device and summed — the distributed
  equivalent of the global scatter-add.
* **CG on owned nodes only**: inner products are ``psum``-reduced over the
  mesh axis, so the Krylov iteration is *exactly* the single-device one (up
  to f32 summation order).

The host-side partitioner renumbers nodes by spatial sort, assigns every
constraint to the slab owning its lowest node, and verifies the halo band
covers every constraint's index spread — constraints never span more than
two adjacent slabs by construction of the sort.

v2 scope: the full PD constraint stack (distance / position / strain /
volume / bend / shape / goal), floor contacts (assigned per *corner owner*,
so they are exactly local), and the **dynamic point-triangle collision
pipeline** (``Solver.cpp:680-875``):

* every slab carries a *triangle view* — its owned triangles plus every
  neighbor triangle fully contained in the halo band — in view-local node
  coordinates;
* all view triangles insert into the slab's broadphase grid and serve as
  candidates, but only *owned* triangles generate contacts
  (``emit_mask``), so each contact is produced by exactly one slab;
* contact force/diagonal scatters land on view slots and ride the existing
  halo reduce; stabilization and friction accumulate their count-averaged
  deltas over the view and halo-reduce before applying — bitwise the same
  fixed point as the single-device tick up to f32 summation order;
* correctness requires the halo band to be wide enough that any
  spatially-overlapping pair is index-local: the partitioner measures the
  band's *spatial* width at every slab boundary and raises when it is
  narrower than ``collision_margin`` (threshold + max triangle extent +
  per-substep motion slack).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..collision.batches import W_STATIC, empty_collision_set
from ..options import PhysicsParams, StepConfig
from ..state import SolverState, park_positions
from ..topology import (
    BendBatch,
    DistanceBatch,
    GroupBatch,
    PositionBatch,
    TetBatch,
    Topology,
)
from ..solver import assembly

_F32 = np.float32
_I32 = np.int32


def _round_up(n: int, m: int) -> int:
    return max(m, -(-n // m) * m)


@jax.tree_util.register_dataclass
@dataclass
class DomainState:
    """Per-slab dynamic state; every leaf has a leading device axis [D, ...]."""

    positions: jax.Array  # f32[D, L, 3] owned nodes
    prev_positions: jax.Array  # f32[D, L, 3]
    velocities: jax.Array  # f32[D, L, 3]
    shape_quats: jax.Array  # f32[D, G, 4]
    sim_failed: jax.Array  # bool[D]


@jax.tree_util.register_dataclass
@dataclass
class DomainStatic:
    """Per-slab static data (node attributes as halo *views*, local-index
    constraint batches); leading device axis [D, ...]."""

    # Node attributes over the local view [L + 2B] (halo values are real
    # neighbor attributes — needed by projections that read inv_mass/mass).
    inv_mass_view: jax.Array  # f32[D, V]
    mass_view: jax.Array  # f32[D, V]
    node_mask_view: jax.Array  # f32[D, V]
    radius_view: jax.Array  # f32[D, V] (node-node collision radii)
    # Owner-only mass embedded in the view (halo slots zero): the M/h² terms
    # of the operator and RHS count each node exactly once — on its owner.
    mass_own_view: jax.Array  # f32[D, V]
    # Owned slice of the global assembled stiffness diagonal (complete: the
    # global precompute already sums every constraint, including ones
    # assigned to neighbor slabs).
    stiffness_diag_own: jax.Array  # f32[D, L]
    # Constraint batches with view-local indices (stiffness_diag zeroed;
    # floor_count carries per-owned-node corner multiplicities over the view,
    # halo slots zero — floor contacts are owner-local by construction, see
    # Solver.cpp:829-834 and the dense-floor note in collision/batches.py).
    # topo.triangles/tri_mask hold the slab's triangle *view* (owned +
    # halo-contained neighbors, view-local indices) for the collision
    # pipeline.
    topo: Topology  # leaves [D, ...]
    # Owned-triangle mask over the triangle view: only these generate
    # contacts (each contact produced by exactly one slab).
    tri_emit_mask: jax.Array  # f32[D, Tv]


@dataclass(frozen=True)
class DomainMeta:
    """Static partition geometry (jit-static)."""

    n_slabs: int
    block: int  # L: owned nodes per slab
    halo: int  # B: halo band width (nodes)
    axis_name: str = "x"

    @property
    def view(self) -> int:
        return self.block + 2 * self.halo


@dataclass
class Domain:
    """Host-side partition result."""

    meta: DomainMeta
    state: DomainState
    static: DomainStatic
    perm: np.ndarray  # new -> old node index
    inv_perm: np.ndarray  # old -> new
    group_slab: np.ndarray  # global group -> (slab, local group slot)


# ---------------------------------------------------------------------------
# Host-side partitioner
# ---------------------------------------------------------------------------


def _slab_of(idx_new: np.ndarray, w: np.ndarray, block: int) -> np.ndarray:
    """Slab owning each constraint: the slab of its lowest (live) node."""
    lo = idx_new.min(axis=-1) if idx_new.ndim > 1 else idx_new
    return np.where(np.asarray(w) > 0, lo // block, 0).astype(_I32)


def _needed_halo(idx_new: np.ndarray, w: np.ndarray, block: int) -> int:
    if idx_new.size == 0:
        return 0
    idx2 = idx_new.reshape(idx_new.shape[0], -1)
    live = np.asarray(w) > 0
    if not np.any(live):
        return 0
    slab = idx2.min(axis=-1) // block
    over = idx2.max(axis=-1) - ((slab + 1) * block - 1)
    return int(max(0, over[live].max()))


def _stack_rows(
    rows_per_slab: list[np.ndarray], cap: int, fill=0
) -> np.ndarray:
    d = len(rows_per_slab)
    shape = (d, cap) + rows_per_slab[0].shape[1:]
    out = np.full(shape, fill, dtype=rows_per_slab[0].dtype)
    for s, r in enumerate(rows_per_slab):
        out[s, : r.shape[0]] = r
    return out


def partition_domain(
    state: SolverState,
    topo: Topology,
    n_slabs: int,
    halo: int | None = None,
    sort_axis: int | None = None,
    collision_margin: float = 0.0,
) -> Domain:
    """Partition a scene into ``n_slabs`` spatial slabs.

    Renumbers nodes by a spatial sort along the longest scene axis, sizes the
    halo band from the actual constraint index spreads (unless given), and
    emits per-slab constraint batches in view-local coordinates.

    ``collision_margin`` (world units) sizes the halo for the dynamic
    collision pipeline: at every slab boundary the halo band must span at
    least this coordinate width (pass collision threshold + the largest
    swept triangle extent + per-substep motion slack).  0 partitions for
    constraint locality only (collisions off).
    """
    pos = np.asarray(state.positions, _F32)
    mask = np.asarray(state.node_mask, _F32)
    live = mask > 0

    if sort_axis is None:
        lp = pos[live]
        ext = lp.max(axis=0) - lp.min(axis=0) if lp.size else np.ones(3)
        sort_axis = int(np.argmax(ext))

    key = np.where(live, pos[:, sort_axis], np.float32(np.inf))
    perm = np.argsort(key, kind="stable").astype(_I32)  # new -> old

    n_cap = pos.shape[0]
    block = _round_up(-(-n_cap // n_slabs), 8)
    total = block * n_slabs
    extra = total - n_cap  # extend with extra parked padding nodes

    inv_perm = np.empty(total, dtype=_I32)
    inv_perm[perm] = np.arange(n_cap, dtype=_I32)
    inv_perm[n_cap:] = np.arange(n_cap, total, dtype=_I32)

    def node_attr(a: np.ndarray, pad_value) -> np.ndarray:
        a = np.asarray(a)
        padded = np.concatenate(
            [a[perm], np.full((extra,) + a.shape[1:], pad_value, a.dtype)]
        )
        return padded

    pos_n = node_attr(pos, 0.0)
    if extra:
        pos_n[n_cap:] = park_positions(extra, offset=n_cap)
    prev_n = node_attr(np.asarray(state.prev_positions, _F32), 0.0)
    if extra:
        prev_n[n_cap:] = pos_n[n_cap:]
    vel_n = node_attr(np.asarray(state.velocities, _F32), 0.0)
    im_n = node_attr(np.asarray(state.inv_mass, _F32), 0.0)
    m_n = node_attr(np.asarray(state.mass, _F32), 1.0)
    mask_n = node_attr(mask, 0.0)

    # --- halo sizing from actual constraint spreads -----------------------
    def remap(idx):
        return inv_perm[np.asarray(idx, _I32)]

    d_idx = remap(np.asarray(topo.distance.idx))
    p_idx = remap(np.asarray(topo.position.idx))
    s_idx = remap(np.asarray(topo.strain.idx))
    v_idx = remap(np.asarray(topo.volume.idx))
    b_idx = remap(np.asarray(topo.bend.idx))
    tri_idx = remap(np.asarray(topo.triangles))

    need = 0
    for idx, w in (
        (d_idx, topo.distance.w),
        (s_idx, topo.strain.w),
        (v_idx, topo.volume.w),
        (b_idx, topo.bend.w),
    ):
        need = max(need, _needed_halo(idx, np.asarray(w), block))

    # Shape/goal groups: spread measured over each group's members.
    def group_spread(grp: GroupBatch):
        ni = remap(np.asarray(grp.node_idx))
        gi = np.asarray(grp.group_idx)
        mm = np.asarray(grp.member_mask) > 0
        worst = 0
        for g in range(grp.num_groups):
            sel = mm & (gi == g)
            if not np.any(sel):
                continue
            lo, hi = ni[sel].min(), ni[sel].max()
            worst = max(worst, int(hi - (lo // block + 1) * block + 1))
        return max(0, worst)

    need = max(need, group_spread(topo.shape), group_spread(topo.goal))
    # Triangles must be fully containable in a view (collision pipeline).
    tri_live = np.asarray(topo.tri_mask) > 0
    if np.any(tri_live):
        need = max(
            need, _needed_halo(tri_idx, np.asarray(topo.tri_mask), block)
        )
    # Collision halo: any spatially-overlapping pair must be index-local.
    # The sort key is the coordinate along sort_axis, so the number of nodes
    # within `collision_margin` of a slab boundary bounds the index distance
    # of any cross-boundary contact pair.
    if collision_margin > 0.0 and np.any(live):
        key_sorted = np.sort(pos[live][:, sort_axis])
        for s in range(1, n_slabs):
            bidx = min(s * block, key_sorted.shape[0] - 1)
            c = key_sorted[bidx]
            inside = np.sum(
                (key_sorted >= c - collision_margin)
                & (key_sorted <= c + collision_margin)
            )
            need = max(need, int(inside))
    if halo is None:
        halo = _round_up(max(need, 8), 8)
    elif need > halo:
        raise ValueError(
            f"halo {halo} too small: constraints span {need} nodes past "
            f"their slab boundary (block={block})"
        )
    if halo > block:
        raise ValueError(
            f"halo {halo} exceeds block {block}: too many slabs for this "
            "scene's constraint locality"
        )
    meta = DomainMeta(n_slabs=n_slabs, block=block, halo=halo)
    view = meta.view

    def localize(idx_new: np.ndarray, slab: np.ndarray) -> np.ndarray:
        loc = idx_new - slab.reshape((-1,) + (1,) * (idx_new.ndim - 1)) * block + halo
        return np.clip(loc, 0, view - 1).astype(_I32)

    # --- per-slab constraint batches --------------------------------------
    def split(idx_new, w, *extras):
        """Partition one batch's rows by slab; returns per-slab row lists of
        (local_idx, w, *extras)."""
        w = np.asarray(w)
        slab = _slab_of(idx_new, w, block)
        rows = []
        for s in range(n_slabs):
            sel = (slab == s) & (w > 0)
            loc = localize(idx_new[sel], slab[sel])
            rows.append((loc, w[sel]) + tuple(np.asarray(e)[sel] for e in extras))
        return rows

    def stack_batch(rows, mk):
        cap = _round_up(max((r[0].shape[0] for r in rows), default=0), 8)
        cols = len(rows[0])
        stacked = []
        for c in range(cols):
            per = [r[c] for r in rows]
            fill = 0
            stacked.append(_stack_rows(per, cap, fill))
        return mk(*stacked)

    dist_rows = split(d_idx, topo.distance.w, topo.distance.rest)
    dist = stack_batch(
        dist_rows, lambda i, w, rest: DistanceBatch(idx=i, rest=rest, w=w)
    )
    pos_rows = split(
        p_idx.reshape(-1, 1), topo.position.w, topo.position.target
    )
    posb = stack_batch(
        pos_rows,
        lambda i, w, tgt: PositionBatch(idx=i[..., 0], target=tgt, w=w),
    )

    def tet_batch(idx_new, t: TetBatch):
        # qinv/g are stored transposed-flat ([9, C]/[12, C]); split selects
        # per-tet rows, so hand it the [C, ·] transpose and restore the
        # flat layout on the stacked [S, c, ·] output.
        rows = split(
            idx_new, t.w, np.asarray(t.qinv).T, np.asarray(t.g).T, t.lo, t.hi
        )
        return stack_batch(
            rows,
            lambda i, w, qinv, g, lo, hi: TetBatch(
                idx=i,
                qinv=np.ascontiguousarray(np.swapaxes(qinv, 1, 2)),
                g=np.ascontiguousarray(np.swapaxes(g, 1, 2)),
                lo=lo,
                hi=hi,
                w=w,
            ),
        )

    strain = tet_batch(s_idx, topo.strain)
    volume = tet_batch(v_idx, topo.volume)
    bend_rows = split(b_idx, topo.bend.w, topo.bend.rest_angle)
    bend = stack_batch(
        bend_rows, lambda i, w, rest: BendBatch(idx=i, rest_angle=rest, w=w)
    )

    def split_groups(grp: GroupBatch):
        """Assign each group to the slab of its lowest member."""
        ni = remap(np.asarray(grp.node_idx))
        gi = np.asarray(grp.group_idx)
        mm = np.asarray(grp.member_mask) > 0
        g_slab = np.zeros(grp.num_groups, _I32)
        g_map = np.full((grp.num_groups, 2), -1, _I32)
        members: list[list] = [[] for _ in range(n_slabs)]
        groups: list[list] = [[] for _ in range(n_slabs)]
        gmask = np.asarray(grp.group_mask)
        for g in range(grp.num_groups):
            sel = mm & (gi == g)
            if not (gmask[g] > 0 and np.any(sel)):
                continue
            s = int(ni[sel].min() // block)
            g_slab[g] = s
            slot = len(groups[s])
            g_map[g] = (s, slot)
            groups[s].append(g)
            loc = ni[sel] - s * block + halo
            members[s].append(
                (
                    loc.astype(_I32),
                    np.full(loc.shape[0], slot, _I32),
                    np.asarray(grp.mat_coords)[sel],
                )
            )
        m_cap = _round_up(
            max((sum(m[0].shape[0] for m in ms) for ms in members), default=0),
            8,
        )
        g_cap = max(1, max((len(g) for g in groups), default=1))
        ni_s = np.zeros((n_slabs, m_cap), _I32)
        gi_s = np.full((n_slabs, m_cap), g_cap - 1, _I32)
        mc_s = np.zeros((n_slabs, m_cap, 3), _F32)
        mm_s = np.zeros((n_slabs, m_cap), _F32)
        w_s = np.zeros((n_slabs, g_cap), _F32)
        gm_s = np.zeros((n_slabs, g_cap), _F32)
        ic_s = np.ones((n_slabs, g_cap), _F32)
        qi_s = np.tile(np.eye(3, dtype=_F32), (n_slabs, g_cap, 1, 1))
        tf_s = np.tile(np.eye(4, dtype=_F32), (n_slabs, g_cap, 1, 1))
        for s in range(n_slabs):
            off = 0
            for slot, g in enumerate(groups[s]):
                loc, gl, mc = members[s][slot]
                cnt = loc.shape[0]
                ni_s[s, off : off + cnt] = loc
                gi_s[s, off : off + cnt] = gl
                mc_s[s, off : off + cnt] = mc
                mm_s[s, off : off + cnt] = 1.0
                off += cnt
                w_s[s, slot] = np.asarray(grp.w)[g]
                gm_s[s, slot] = 1.0
                ic_s[s, slot] = np.asarray(grp.inv_count)[g]
                qi_s[s, slot] = np.asarray(grp.qinv)[g]
                tf_s[s, slot] = np.asarray(grp.transforms)[g]
        batch = GroupBatch(
            node_idx=ni_s,
            group_idx=gi_s,
            mat_coords=mc_s,
            member_mask=mm_s,
            w=w_s,
            group_mask=gm_s,
            inv_count=ic_s,
            qinv=qi_s,
            transforms=tf_s,
        )
        return batch, g_map

    shape_b, shape_map = split_groups(topo.shape)
    goal_b, goal_map = split_groups(topo.goal)

    # Floor-contact multiplicity per owned node (owner-local by nature).
    corners = tri_idx.reshape(-1)
    cm = np.repeat(np.asarray(topo.tri_mask), 3) > 0
    floor_count = np.zeros(total, _F32)
    np.add.at(floor_count, corners[cm], 1.0)

    # --- per-slab triangle views (collision pipeline) ----------------------
    # A slab's view holds every live triangle fully contained in
    # [s·block − halo, s·block + block + halo); owned (emitting) triangles
    # are those whose lowest node the slab owns.
    tri_rows, emit_rows = [], []
    if np.any(tri_live):
        tmin = tri_idx.min(axis=1)
        tmax = tri_idx.max(axis=1)
        for s in range(n_slabs):
            inview = (
                tri_live
                & (tmin >= s * block - halo)
                & (tmax < s * block + block + halo)
            )
            owned = inview & (tmin >= s * block) & (tmin < (s + 1) * block)
            loc = tri_idx[inview] - s * block + halo
            tri_rows.append(loc.astype(_I32))
            emit_rows.append(owned[inview].astype(_F32))
    else:
        tri_rows = [np.zeros((0, 3), _I32)] * n_slabs
        emit_rows = [np.zeros((0,), _F32)] * n_slabs
    tv_cap = _round_up(max(r.shape[0] for r in tri_rows), 8) if any(
        r.shape[0] for r in tri_rows
    ) else 0
    tri_view = _stack_rows(
        [r.reshape(-1, 3) for r in tri_rows], tv_cap
    ) if tv_cap else np.zeros((n_slabs, 0, 3), _I32)
    tri_mask_view = _stack_rows(
        [np.ones(r.shape[0], _F32) for r in tri_rows], tv_cap
    ) if tv_cap else np.zeros((n_slabs, 0), _F32)
    tri_emit = _stack_rows(emit_rows, tv_cap) if tv_cap else np.zeros(
        (n_slabs, 0), _F32
    )

    # --- node-attribute views ---------------------------------------------
    def window(a: np.ndarray, pad_value=0.0) -> np.ndarray:
        padded = np.concatenate(
            [
                np.full((halo,) + a.shape[1:], pad_value, a.dtype),
                a,
                np.full((halo,) + a.shape[1:], pad_value, a.dtype),
            ]
        )
        return np.stack(
            [padded[s * block : s * block + view] for s in range(n_slabs)]
        )

    # Global assembled stiffness diagonal, owned slices.
    stiff = np.concatenate(
        [np.asarray(topo.stiffness_diag)[perm], np.zeros(extra, _F32)]
    )
    stiff_own = stiff.reshape(n_slabs, block)

    d_axis = n_slabs
    topo_local = Topology(
        distance=dist,
        position=posb,
        strain=strain,
        volume=volume,
        bend=bend,
        shape=shape_b,
        goal=goal_b,
        triangles=tri_view,
        tri_mask=tri_mask_view,
        tri_rep_mask=np.zeros((d_axis, 0), _F32),
        tri_body_count=np.zeros((d_axis, 0), _I32),
        tets=np.zeros((d_axis, 0, 4), _I32),
        tet_mask=np.zeros((d_axis, 0), _F32),
        stiffness_diag=np.zeros((d_axis, view), _F32),
        tet_band=np.zeros((d_axis, 7, 1), _F32),
        floor_count=window(floor_count) * _own_window_mask(meta),
        ata_dense=np.zeros((d_axis, 1, 1), _F32),
        inv_dense=np.zeros((d_axis, 1, 1), _F32),
    )

    quats = np.asarray(state.shape_quats, _F32)
    g_cap_s = shape_b.w.shape[1]
    quats_s = np.zeros((n_slabs, g_cap_s, 4), _F32)
    quats_s[..., 0] = 1.0
    for g, (s, slot) in enumerate(shape_map):
        if s >= 0 and g < quats.shape[0]:
            quats_s[s, slot] = quats[g]

    dstate = DomainState(
        positions=pos_n.reshape(n_slabs, block, 3),
        prev_positions=prev_n.reshape(n_slabs, block, 3),
        velocities=vel_n.reshape(n_slabs, block, 3),
        shape_quats=quats_s,
        sim_failed=np.zeros(n_slabs, bool),
    )
    mass_own = np.where(mask_n > 0, m_n, m_n)  # padded nodes keep mass 1
    dstatic = DomainStatic(
        inv_mass_view=window(im_n),
        mass_view=window(m_n, pad_value=1.0),
        node_mask_view=window(mask_n),
        radius_view=window(node_attr(np.asarray(state.radius, _F32), 0.0)),
        mass_own_view=window(mass_own) * _own_window_mask(meta),
        stiffness_diag_own=stiff_own,
        topo=topo_local,
        tri_emit_mask=tri_emit,
    )
    return Domain(
        meta=meta,
        state=dstate,
        static=dstatic,
        perm=perm,
        inv_perm=inv_perm[:n_cap],
        group_slab=shape_map,
    )


def _own_window_mask(meta: DomainMeta) -> np.ndarray:
    m = np.zeros(meta.view, _F32)
    m[meta.halo : meta.halo + meta.block] = 1.0
    return m[None, :]


def gather_positions(domain: Domain, dstate: DomainState) -> np.ndarray:
    """Owned positions back in the original node order (live prefix)."""
    flat = np.asarray(dstate.positions).reshape(-1, 3)
    return flat[domain.inv_perm]


# ---------------------------------------------------------------------------
# Device-side sharded step
# ---------------------------------------------------------------------------


def _halo_refresh(x_own: jax.Array, meta: DomainMeta) -> jax.Array:
    """[L, ...] owned -> [L+2B, ...] view with neighbor boundary bands."""
    b, d, ax = meta.halo, meta.n_slabs, meta.axis_name
    right_band = x_own[-b:]
    left_band = x_own[:b]
    # My left halo is my LEFT neighbor's tail: left neighbor sends forward.
    from_left = jax.lax.ppermute(
        right_band, ax, perm=[(i, i + 1) for i in range(d - 1)]
    )
    from_right = jax.lax.ppermute(
        left_band, ax, perm=[(i + 1, i) for i in range(d - 1)]
    )
    return jnp.concatenate([from_left, x_own, from_right], axis=0)


def _halo_reduce(y_view: jax.Array, meta: DomainMeta) -> jax.Array:
    """[L+2B, ...] view partials -> [L, ...] complete owned values."""
    b, l, d, ax = meta.halo, meta.block, meta.n_slabs, meta.axis_name
    own = y_view[b : b + l]
    to_left = y_view[:b]  # partials for my left neighbor's tail
    to_right = y_view[b + l :]
    from_right = jax.lax.ppermute(
        to_left, ax, perm=[(i + 1, i) for i in range(d - 1)]
    )
    from_left = jax.lax.ppermute(
        to_right, ax, perm=[(i, i + 1) for i in range(d - 1)]
    )
    own = own.at[l - b :].add(from_right).at[:b].add(from_left)
    return own


def _domain_pcg(matvec, b_own, x0_own, diag_own, iterations, meta, rtol=0.0):
    """Jacobi-PCG on owned nodes; inner products ``psum`` over the mesh axis
    (the distributed twin of ``assembly.pcg_solve``, including the
    deterministic ``rtol`` early exit — trip counts match the single-device
    solve up to f32 summation order)."""
    ax = meta.axis_name
    inv_diag = (1.0 / diag_own)[:, None]

    def dot(a, c):
        return jax.lax.psum(jnp.sum(a * c), ax)

    r = b_own - matvec(x0_own)
    z = inv_diag * r
    p = z
    rz = dot(r, z)
    rz0 = rz

    def step(carry):
        x, r, p, rz, i = carry
        ap = matvec(p)
        p_ap = dot(p, ap)
        alpha = jnp.where(p_ap > 0, rz / jnp.maximum(p_ap, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = inv_diag * r
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        p = z + beta * p
        return x, r, p, rz_new, i + 1

    if rtol > 0.0:
        tol2 = rtol * rtol * rz0

        def cond(carry):
            _, _, _, rz, i = carry
            return (i < iterations) & (rz > tol2)

        x, r, _, _, _ = jax.lax.while_loop(
            cond, step, (x0_own, r, p, rz, jnp.int32(0))
        )
    else:
        x, r, _, _, _ = jax.lax.fori_loop(
            0, iterations, lambda _, c: step(c), (x0_own, r, p, rz, jnp.int32(0))
        )
    return x, jnp.sqrt(dot(r, r))


def _domain_substep(
    dstate_l,
    dstatic_l,
    params: PhysicsParams,
    config: StepConfig,
    meta: DomainMeta,
):
    """One PD substep on one slab (runs inside shard_map; all arrays local)."""
    b, l = meta.halo, meta.block
    h = params.dt
    h2 = h * h
    topo = dstatic_l.topo
    mask_own = dstatic_l.node_mask_view[b : b + l, None]
    im_own = dstatic_l.inv_mass_view[b : b + l]
    mass_own = dstatic_l.mass_own_view[b : b + l]

    # Inertia estimate on owned nodes (Solver.cpp:229-238); gravity force.
    forces_own = (
        jnp.zeros((l, 3), dstate_l.positions.dtype)
        .at[:, 1]
        .set(-params.gravity * mass_own * mask_own[:, 0])
    )
    x_own = dstate_l.positions + h * dstate_l.velocities * mask_own
    prev_own = dstate_l.prev_positions

    # Dense floor contacts over the view (counts are owner-local: halo slots
    # carry zero multiplicity by construction).
    from ..collision.batches import detect_floor_active

    x_view = _halo_refresh(x_own, meta)
    floor_count = topo.floor_count
    floor_active = detect_floor_active(
        x_view, floor_count, params.floor_height, params.collision_thickness
    )
    colls = empty_collision_set(pt_cap=0, static_cap=0)
    colls = replace(colls, floor_active=floor_active)

    # Dynamic point-triangle collisions over the slab's triangle view; only
    # owned triangles emit (tri_emit_mask), so each contact is generated by
    # exactly one slab.  Contact indices are view-local — their force /
    # operator / stabilization scatters ride the existing halo reduce.
    coll_overflow = jnp.asarray(False)
    prev_view = None
    if config.enable_collisions and topo.triangles.shape[0] > 0:
        from ..collision.broadphase import detect_point_tri_collisions

        prev_view = _halo_refresh(prev_own, meta)
        pt_idx, pt_mask, coll_overflow = detect_point_tri_collisions(
            x_view,
            prev_view,
            topo.triangles,
            topo.tri_mask,
            params,
            config,
            emit_mask=dstatic_l.tri_emit_mask,
        )
        colls = replace(colls, pt_idx=pt_idx, pt_mask=pt_mask)

    # Edge-edge contacts (StepConfig.enable_edge_collisions): the query of a
    # pair is its lower-id triangle, and localization preserves id order, so
    # the owned-triangle emit mask yields each pair on exactly one slab.
    # Gating matches solver/step.py's default_detect_collisions: edge and
    # node-node run on their own flags, independent of enable_collisions.
    if config.enable_edge_collisions and topo.triangles.shape[0] > 0:
        from ..collision.broadphase import detect_edge_edge_collisions

        if prev_view is None:
            prev_view = _halo_refresh(prev_own, meta)
        edge_idx, edge_mask, e_over = detect_edge_edge_collisions(
            x_view,
            prev_view,
            topo.triangles,
            topo.tri_mask,
            params,
            config,
            emit_mask=dstatic_l.tri_emit_mask,
        )
        colls = replace(colls, edge_idx=edge_idx, edge_mask=edge_mask)
        coll_overflow = coll_overflow | e_over

    # Node-node PD contacts (StepConfig.enable_node_collisions) over the
    # view grid; pair (i < j) emits from node i, restricted to owned nodes.
    if config.enable_node_collisions:
        from types import SimpleNamespace

        from ..collision.broadphase import detect_node_node_pairs

        own_emit = (
            jnp.zeros((meta.view,), x_own.dtype)
            .at[b : b + l]
            .set(1.0)
            * dstatic_l.node_mask_view
        )
        shim = SimpleNamespace(
            node_mask=dstatic_l.node_mask_view, radius=dstatic_l.radius_view
        )
        nn_idx, nn_mask = detect_node_node_pairs(
            shim, x_view, params, config, emit_mask=own_emit
        )
        colls = replace(colls, nn_idx=nn_idx, nn_mask=nn_mask)

    mass_h2_view = dstatic_l.mass_own_view / h2
    msn_h2_own = x_own * (mass_own / h2)[:, None]

    # Contact diagonals over the view (floor entries are owner-local; pt /
    # edge / node-node entries may land on halo slots and are returned to
    # their owner by ONE halo reduce below).  static_diag_view is the dense
    # diagonal the operator applies per CG matvec; diag_own is the complete
    # assembled Jacobi-preconditioner diagonal (mirrors solver/pd.py).
    static_diag_view = W_STATIC * floor_count * floor_active
    if colls.nn_idx.shape[0]:
        static_diag_view = static_diag_view + assembly.node_node_diag(
            colls, meta.view, x_own.dtype
        )
    pt_diag_view = None
    if colls.pt_idx.shape[0] or colls.edge_idx.shape[0]:
        pt_diag_view = jnp.zeros((meta.view,), x_own.dtype)
        if colls.pt_idx.shape[0]:
            pt_diag_view = pt_diag_view + assembly.point_tri_collision_diag(
                colls, meta.view, x_own.dtype
            )
        if colls.edge_idx.shape[0]:
            pt_diag_view = pt_diag_view + assembly.edge_collision_diag(
                colls, meta.view, x_own.dtype
            )
        if config.contact_coupling in ("diagonal", "recentered"):
            static_diag_view = static_diag_view + pt_diag_view
    contact_diag_view = static_diag_view
    if pt_diag_view is not None and config.contact_coupling == "full":
        contact_diag_view = contact_diag_view + pt_diag_view
    diag_own = (
        mass_own / h2
        + dstatic_l.stiffness_diag_own
        + contact_diag_view[b : b + l]
    )
    if (
        colls.pt_idx.shape[0]
        or colls.nn_idx.shape[0]
        or colls.edge_idx.shape[0]
    ):
        # Neighbor slabs' contributions to my owned nodes arrive scattered
        # on their halo slots; floor terms are owner-local (zero there).
        diag_own = diag_own + _halo_reduce(
            contact_diag_view.at[b : b + l].set(0.0), meta
        )

    def matvec(v_own):
        v_view = _halo_refresh(v_own, meta)
        y_view = assembly.apply_system(
            v_view,
            mass_h2_view,
            topo,
            colls,
            static_diag=static_diag_view,
            contact_coupling=config.contact_coupling,
        )
        return _halo_reduce(y_view, meta)

    def iteration(_, carry):
        x_own, quats, residual, _ = carry
        x_view = _halo_refresh(x_own, meta)
        local = assembly.local_step(
            x_view,
            dstatic_l.inv_mass_view,
            dstatic_l.mass_view,
            quats,
            topo,
            colls,
            params.collision_thickness,
            params.floor_height,
            config.rotation_iterations,
            config.reference_quirks,
            radius=dstatic_l.radius_view,
            pt_full=(config.contact_coupling == "full"),
        )
        # RHS: M sn/h² on owned slots + constraint AᵀB p over the view.
        msn_view = (
            jnp.zeros((meta.view, 3), x_own.dtype).at[b : b + l].set(msn_h2_own)
        )
        f_view = assembly.assemble_force(
            msn_view,
            local,
            topo,
            colls,
            contact_coupling=config.contact_coupling,
            x=x_view,
            pt_diag=pt_diag_view,
        )
        f_own = _halo_reduce(f_view, meta)
        x_new, residual = _domain_pcg(
            matvec, f_own, x_own, diag_own, config.cg_iterations, meta,
            rtol=config.cg_rtol,
        )
        x_new = jnp.where(mask_own > 0, x_new, x_own)
        return x_new, local.quats, residual, local.static

    static_proj0 = jnp.zeros((meta.view, 3), x_own.dtype)
    x_own, quats, residual, static_proj = jax.lax.fori_loop(
        0,
        config.iterations,
        iteration,
        (
            x_own,
            dstate_l.shape_quats,
            jnp.asarray(0.0, x_own.dtype),
            static_proj0,
        ),
    )

    # Stabilization (Solver.cpp:367-383): point-triangle push-out with the
    # count-averaged accumulator halo-reduced across slabs, then the dense
    # floor snap on owned slots — the same per-iteration order as the
    # single-device tick (solver/pd.py).
    if config.collision_stabilization_iterations > 0:
        from ..collision.batches import (
            stabilize_edge_edge_acc,
            stabilize_point_tri_acc,
        )

        def stabilize(_, carry):
            x_own, prev_own = carry
            if colls.pt_idx.shape[0]:
                xv = _halo_refresh(x_own, meta)
                acc = stabilize_point_tri_acc(
                    xv,
                    dstatic_l.inv_mass_view,
                    colls.pt_idx,
                    colls.pt_mask,
                    params.collision_thickness,
                )
                acc_own = _halo_reduce(acc, meta)
                delta = acc_own[:, :3] / jnp.maximum(acc_own[:, 3], 1.0)[:, None]
                x_own = x_own + delta
                prev_own = prev_own + delta
            if config.enable_edge_collisions and colls.edge_idx.shape[0]:
                xv = _halo_refresh(x_own, meta)
                acc = stabilize_edge_edge_acc(
                    xv,
                    dstatic_l.inv_mass_view,
                    colls.edge_idx,
                    colls.edge_mask,
                    params.collision_thickness,
                    config.reference_quirks,
                )
                acc_own = _halo_reduce(acc, meta)
                delta = acc_own[:, :3] / jnp.maximum(acc_own[:, 3], 1.0)[:, None]
                x_own = x_own + delta
                prev_own = prev_own + delta
            x_own = jnp.where(
                floor_active[b : b + l, None] > 0,
                static_proj[b : b + l],
                x_own,
            )
            return x_own, prev_own

        x_own, prev_own = jax.lax.fori_loop(
            0,
            config.collision_stabilization_iterations,
            stabilize,
            (x_own, prev_own),
        )

    vel = (
        (1.0 - params.damping) * (x_own - prev_own) / h
        + h * forces_own * im_own[:, None]
    ) * mask_own

    # Node-node friction (Solver.cpp:398-428), then point-triangle friction
    # + restitution (Solver.cpp:431-471): each count-averaged impulse
    # accumulator halo-reduces across slabs, exactly like stabilization.
    # Velocities of halo nodes come from one refresh per pass (pre-pass
    # values, matching the single-device Jacobi application order in
    # solver/pd.py's contact_passes).
    if colls.nn_idx.shape[0]:
        from ..solver.pd import node_node_friction_acc

        xv = _halo_refresh(x_own, meta)
        vv = _halo_refresh(vel, meta)
        acc = node_node_friction_acc(
            xv, vv, dstatic_l.inv_mass_view, dstatic_l.radius_view,
            colls.nn_idx, colls.nn_mask, params,
        )
        acc_own = _halo_reduce(acc, meta)
        vel = vel + acc_own[:, :3] / jnp.maximum(acc_own[:, 3], 1.0)[:, None]
    if colls.pt_idx.shape[0]:
        from ..solver.pd import point_tri_friction_acc

        xv = _halo_refresh(x_own, meta)
        vv = _halo_refresh(vel, meta)
        acc = point_tri_friction_acc(
            xv, vv, dstatic_l.inv_mass_view, colls.pt_idx, colls.pt_mask,
            params,
        )
        acc_own = _halo_reduce(acc, meta)
        vel = vel + acc_own[:, :3] / jnp.maximum(acc_own[:, 3], 1.0)[:, None]

    # Floor friction (Solver.cpp:473-484) per owned node.
    counts = (floor_count * floor_active)[b : b + l]
    perp = vel.at[:, 1].set(0.0)
    static = (
        jnp.linalg.norm(perp, axis=-1) < params.static_friction_threshold
    )
    factor = jnp.where(
        static, jnp.zeros_like(counts), (1.0 - params.friction) ** counts
    )
    factor = jnp.where(counts > 0, factor, 1.0)
    scaled = vel * factor[:, None]
    vel = vel.at[:, 0].set(scaled[:, 0]).at[:, 2].set(scaled[:, 2])

    failed_local = jnp.logical_or(
        ~jnp.all(jnp.isfinite(x_own)), coll_overflow
    )
    any_failed = (
        jax.lax.psum(failed_local.astype(jnp.int32), meta.axis_name) > 0
    )
    new_state = DomainState(
        positions=x_own,
        prev_positions=x_own,
        velocities=vel,
        shape_quats=quats,
        sim_failed=jnp.logical_or(dstate_l.sim_failed, any_failed),
    )
    return new_state, residual


def make_domain_tick(mesh: Mesh, config: StepConfig, meta: DomainMeta):
    """Compile the sharded tick: ``time_substeps`` domain substeps under one
    ``shard_map`` program.  Returns ``tick(dstate, dstatic, params) ->
    (dstate, residual)``."""
    import dataclasses

    if config.budget.body_stride != 1 or config.body_nodes:
        # Packed/body-granular broadphase layouts assume the original node
        # numbering; the spatial renumbering breaks body contiguity, so the
        # domain tick always runs the general cell-list path.
        config = dataclasses.replace(
            config,
            body_nodes=0,
            body_node_offset=0,
            body_faces=(),
            budget=dataclasses.replace(config.budget, body_stride=1),
        )
    dspec = jax.tree_util.tree_map(lambda _: P(meta.axis_name), _struct(DomainState))
    sspec = jax.tree_util.tree_map(lambda _: P(meta.axis_name), _struct(DomainStatic))

    def local_tick(dstate_l, dstatic_l, params):
        # Shard-local leaves arrive with a leading length-1 device axis.
        dstate_l = jax.tree_util.tree_map(lambda a: a[0], dstate_l)
        dstatic_l = jax.tree_util.tree_map(lambda a: a[0], dstatic_l)

        def sub(carry, _):
            s, _ = carry
            s, res = _domain_substep(s, dstatic_l, params, config, meta)
            return (s, res), None

        (dstate_l, res), _ = jax.lax.scan(
            sub,
            (dstate_l, jnp.asarray(0.0, jnp.float32)),
            None,
            length=config.time_substeps,
        )
        dstate_l = jax.tree_util.tree_map(lambda a: a[None], dstate_l)
        return dstate_l, res

    sharded = jax.shard_map(
        local_tick,
        mesh=mesh,
        in_specs=(dspec, sspec, P()),
        out_specs=(dspec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def _struct(cls):
    import dataclasses

    return cls(**{f.name: 0 for f in dataclasses.fields(cls)})
