"""Per-substep collision constraint batches.

The reference regenerates collision constraints every substep from the
broadphase sweep (``Solver.cpp:680-875``) into dynamically-sized vectors.
Under XLA they become fixed-capacity batches with validity masks plus an
overflow latch that reproduces the ``_simFailed`` semantics
(``Solver.cpp:741-755,852-856``).

Weights mirror the reference headers:

* node-node ``CollisionConstraint``: w = 1e5 (``CollisionConstraint.h:14``)
* ``PointTriangleCollisionConstraint``: w = 1e4 (``CollisionConstraint.h:33``)
* ``EdgeCollisionConstraint``: w = 1e6 (``CollisionConstraint.h:56``)
* ``StaticCollisionConstraint`` (floor): w = 1e4 (``CollisionConstraint.h:78``)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

W_NODE_NODE = 1.0e5
W_POINT_TRI = 1.0e4
W_EDGE = 1.0e6
W_STATIC = 1.0e4

# AᵀA of the point-triangle / edge collision differential matrix
# A = [[0,0,0,0],[-1,1,0,0],[-1,0,1,0],[-1,0,0,1]]
# (CollisionConstraint.cpp:74-84,202-211).
ATA_DIFF4 = np.array(
    [
        [3.0, -1.0, -1.0, -1.0],
        [-1.0, 1.0, 0.0, 0.0],
        [-1.0, 0.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


@jax.tree_util.register_dataclass
@dataclass
class CollisionSet:
    """All dynamically-detected constraints for one substep."""

    # Point-triangle: node a against triangle (b, c, d) of another triangle
    # (Solver.cpp:777-797).
    pt_idx: jax.Array  # i32[K, 4]
    pt_mask: jax.Array  # f32[K]
    # Floor contacts, one entry per (triangle, corner) below the threshold —
    # multiplicity preserved (Solver.cpp:829-834 emits duplicates per tri).
    static_idx: jax.Array  # i32[S]
    static_mask: jax.Array  # f32[S]
    # Dense floor-contact activity (config.dense_floor): per-node indicator
    # y < floor + thickness for nodes with live incident triangles.  Combined
    # with Topology.floor_count it carries exactly the same information as
    # the entry list above (every entry of a node shares its test and
    # projection) with zero gathers/scatters.  Shape [N] in dense mode, [0]
    # otherwise — consumers branch on the static shape.
    floor_active: jax.Array  # f32[N] or f32[0]
    # Edge-edge collisions: generation is disabled in the reference
    # (commented out at Solver.cpp:799-823) so this stays empty in quirk mode;
    # the projection kernels exist for the non-quirk extension.
    edge_idx: jax.Array  # i32[E, 4]
    edge_mask: jax.Array  # f32[E]
    # Node-node pairs (only the PBD inline path generates these in the
    # reference; the PD friction pass reads an always-empty list,
    # Solver.cpp:398-428).
    nn_idx: jax.Array  # i32[P, 2]
    nn_mask: jax.Array  # f32[P]
    overflow: jax.Array  # bool[] — any capacity exceeded this substep
    # Updated temporal broadphase cache (state.BroadphaseCache) when the
    # packed-body path ran with one; the substep folds it back into the
    # solver state.  None otherwise.
    bp: object = None


def empty_collision_set(
    pt_cap: int = 0,
    static_cap: int = 0,
    edge_cap: int = 0,
    nn_cap: int = 0,
    dense_floor_nodes: int = 0,
) -> CollisionSet:
    z = lambda *s: jnp.zeros(s, dtype=jnp.int32)
    m = lambda *s: jnp.zeros(s, dtype=jnp.float32)
    return CollisionSet(
        pt_idx=z(pt_cap, 4),
        pt_mask=m(pt_cap),
        static_idx=z(static_cap),
        static_mask=m(static_cap),
        floor_active=m(dense_floor_nodes),
        edge_idx=z(edge_cap, 4),
        edge_mask=m(edge_cap),
        nn_idx=z(nn_cap, 2),
        nn_mask=m(nn_cap),
        overflow=jnp.asarray(False),
    )


def detect_floor_contacts(
    positions: jax.Array,
    triangles: jax.Array,
    tri_mask: jax.Array,
    floor_height: jax.Array,
    thickness: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Floor contact entries exactly as the PD sweep emits them
    (``Solver.cpp:829-834``): for every triangle, every corner with
    ``y < floorHeight + thickness`` produces one ``StaticCollisionConstraint``
    — a node shared by k triangles is emitted k times, and that multiplicity
    feeds the collision matrix (+k·w on the diagonal) and friction passes.

    Returns ``(static_idx i32[T*3], static_mask f32[T*3])``.
    """
    corner_idx = triangles.reshape(-1)  # [T*3]
    y = positions[corner_idx, 1]
    hit = (y < floor_height + thickness) & (
        jnp.repeat(tri_mask, 3) > 0
    )
    return corner_idx, hit.astype(positions.dtype)


SMALL_CONTACTS = 8192


def capped_col_scatter(
    n_rows: int,
    width: int,
    idx: jax.Array,  # i32[K, k] contact node columns
    col_vals,  # list of k value blocks f32[K, width]
    count: jax.Array,  # live contacts (they are a packed prefix of the buffer)
    small: int = SMALL_CONTACTS,
) -> jax.Array:
    """Fused column-major contact scatter with a data-adaptive small path.

    Scatter cost on v5e is ~1.5 ms fixed + rows/20M-per-s, so a capacity-
    sized buffer (T/8 contacts at stress scale) pays ~11 ms per op even when
    a handful of contacts are live.  Detection compacts live contacts to the
    buffer prefix, so when ``count <= small`` a truncated scatter is exact;
    ``lax.cond`` picks the branch at runtime.  Returns ``[n_rows, width]``.
    """
    k_cap = idx.shape[0]

    def branch(kk):
        def fn(_):
            ui = jnp.concatenate([v[:kk] for v in col_vals], axis=0)
            ii = idx[:kk].T.reshape(-1)
            return jnp.zeros((n_rows, width), col_vals[0].dtype).at[ii].add(ui)

        return fn

    if k_cap <= small:
        return branch(k_cap)(None)
    return jax.lax.cond(count <= small, branch(small), branch(k_cap), None)


def capped_contact_acc(
    idx: jax.Array,  # i32[K, k]
    count: jax.Array,  # live contacts (packed prefix of the buffer)
    acc_fn,  # (idx_prefix) -> [n_rows, width] accumulator
    small: int = SMALL_CONTACTS,
) -> jax.Array:
    """Run a whole contact pass (gathers → math → scatter) on the live
    prefix of the contact buffer when ``count <= small``.

    ``capped_col_scatter`` caps only the scatter; at stress scale the
    *gathers* of a capacity-sized pass (4 x 62.5k rows per stabilization
    iteration) cost ~3 ms each even with zero live contacts.  Detection
    compacts live contacts to the buffer prefix, so a truncated pass is
    exact; ``lax.cond`` picks the branch at runtime and both branches
    return the same dense accumulator shape.
    """
    k_cap = idx.shape[0]
    if k_cap <= small:
        return acc_fn(slice(None))
    return jax.lax.cond(
        count <= small,
        lambda _: acc_fn(slice(0, small)),
        lambda _: acc_fn(slice(None)),
        None,
    )


def gather_cols(x: jax.Array, idx: jax.Array):
    """Gather the per-constraint node rows as k separate 2-D [C, 3] arrays.

    ``x[idx]`` with ``idx [C, k]`` materializes a [C, k, 3] buffer whose
    minor (k, 3) dims tile-pad to (8, 128) on TPU — ~40x wasted lanes;
    every touch of such a buffer measured ~11 ms at 62.5k contacts.  One
    flat [k·C, 3] gather (column-major order) plus contiguous slices stays
    2-D everywhere.
    """
    c, k = idx.shape
    g = x[idx.T.reshape(-1)]  # [k*C, ...]
    return tuple(g[i * c : (i + 1) * c] for i in range(k))


def detect_floor_active(
    positions: jax.Array,
    floor_count: jax.Array,
    floor_height: jax.Array,
    thickness: jax.Array,
) -> jax.Array:
    """Dense floor-contact test: per node, 1.0 when it has live incident
    triangles and ``y < floorHeight + thickness`` — the per-corner test of
    ``Solver.cpp:829-834`` hoisted to the node (all corner entries of a node
    share it).  Returns ``f32[N]``."""
    hit = (positions[:, 1] < floor_height + thickness) & (floor_count > 0)
    return hit.astype(positions.dtype)


def project_static_dense(
    positions: jax.Array,
    floor_height: jax.Array,
    reference_quirks: bool,
) -> jax.Array:
    """Dense static-collision projection: :func:`project_static` evaluated
    at every node (no gather).  Returns ``f32[N, 3]``."""
    plane = (
        jnp.zeros_like(floor_height) if reference_quirks else floor_height
    )
    y = jnp.where(positions[:, 1] < plane, plane, positions[:, 1])
    return positions.at[:, 1].set(y)


def project_static(
    positions: jax.Array,
    static_idx: jax.Array,
    floor_height: jax.Array,
    reference_quirks: bool,
) -> jax.Array:
    """Static-collision projection (``CollisionConstraint.cpp:447-455``).

    Quirk mode clamps to the hard-coded plane y = 0 exactly as the reference
    does (it ignores ``floorHeight`` even though detection uses it); non-quirk
    mode clamps to the configured floor height.
    """
    p = positions[static_idx]
    plane = jnp.zeros_like(floor_height) if reference_quirks else floor_height
    y = jnp.where(p[:, 1] < plane, plane, p[:, 1])
    return p.at[:, 1].set(y)


def project_node_node(
    positions: jax.Array,
    radius: jax.Array,
    inv_mass: jax.Array,
    nn_idx: jax.Array,  # i32[P,2]
) -> jax.Array:
    """Node-node local-step projection (``CollisionConstraint.cpp:10-39``):
    push overlapping spheres apart along their center line, inverse-mass
    weighted; non-overlapping pairs project to their current positions
    (w = 1e5, diagonal-only matrix contribution —
    ``CollisionConstraint.cpp:41-46`` adds w to both diagonal entries and
    nothing off-diagonal).  Includes the reference's ``(dispLength, 0, 0)``
    fallback for coincident centers.

    Returns ``projected f32[P, 2, 3]``.
    """
    p = positions[nn_idx]  # [P,2,3]
    a, b = p[:, 0], p[:, 1]
    diff = b - a
    dist_sq = jnp.sum(diff * diff, axis=-1)
    r = radius[nn_idx[:, 0]] + radius[nn_idx[:, 1]]
    overlapping = dist_sq < r * r

    dist = jnp.sqrt(jnp.maximum(dist_sq, 0.0))
    disp_len = r - dist
    disp = jnp.where(
        (dist > 1e-5)[:, None],
        disp_len[:, None] * diff / jnp.maximum(dist, 1e-20)[:, None],
        jnp.stack([disp_len, jnp.zeros_like(disp_len), jnp.zeros_like(disp_len)], axis=-1),
    )
    im = inv_mass[nn_idx]  # [P,2]
    w_sum = jnp.maximum(im[:, 0] + im[:, 1], 1e-20)
    ov = overlapping.astype(positions.dtype)[:, None]
    a_proj = a - ov * disp * (im[:, 0] / w_sum)[:, None]
    b_proj = b + ov * disp * (im[:, 1] / w_sum)[:, None]
    return jnp.stack([a_proj, b_proj], axis=1)


def project_point_tri(
    positions: jax.Array,
    pt_idx: jax.Array,
    thickness: jax.Array,
    build_stack: bool = True,
    pt_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Point-triangle local-step projection
    (``CollisionConstraint.cpp:86-124``): if the point is within ``thickness``
    of the (front side of the) triangle plane, push only the point out along
    the normal; the triangle's projected positions stay put.

    Returns ``(projected f32[K, 4, 3], delta_a f32[K, 3])`` where ``delta_a``
    is the point's displacement (``projected − gathered`` is zero everywhere
    else) — the recentered contact coupling consumes it directly and passes
    ``build_stack=False`` to skip materializing the tile-padded [K, 4, 3]
    stack (projected is then a [0, 4, 3] placeholder).
    """
    def delta_fn(sl):
        a, b, c, d = gather_cols(positions, pt_idx[sl])
        n = jnp.cross(c - b, d - b)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        n_dot_p = jnp.sum(n * (a - b), axis=-1)
        disp = jnp.where(n_dot_p < thickness, thickness - n_dot_p, 0.0)
        delta = disp[:, None] * n
        if not build_stack:
            pad = pt_idx.shape[0] - delta.shape[0]
            if pad:
                delta = jnp.concatenate(
                    [delta, jnp.zeros((pad, 3), delta.dtype)]
                )
            return delta
        return jnp.stack([a + delta, b, c, d], axis=1), delta

    if not build_stack:
        # Recentered coupling only consumes the point displacement; the
        # whole gather → normal → displacement chain runs on the live
        # contact prefix when few contacts are live (capped_contact_acc).
        if pt_count is None:
            pt_count = jnp.asarray(pt_idx.shape[0])
        delta_a = capped_contact_acc(pt_idx, pt_count, delta_fn)
        return jnp.zeros((0, 4, 3), positions.dtype), delta_a
    return delta_fn(slice(None))


def _edge_edge_closest_disp(
    cols,  # tuple of 4 x [E,3]: (a, b) edge 1, (c, d) edge 2
    inv_mass4: jax.Array,  # [E,4]
    thickness: jax.Array,
    reference_quirks: bool,
):
    """Shared core of the edge-edge projection/stabilization
    (``CollisionConstraint.cpp:225-314,316-400``): closest-point parameters
    (u, v) on the two segments, push-out displacement and the mass weights.

    ``reference_quirks=True`` reproduces the constraint's u/v shadowing bug
    (the non-degenerate branch re-declares ``u``/``v`` inside the ``if``,
    ``CollisionConstraint.cpp:253-256``, so the outer zeros are always used);
    False computes the intended closest point.

    Returns ``(active [E], disp [E,3], wa, wb, wc, wd [E])`` with the
    reference's signs: a,b move by +w·disp, c,d by −w·disp.
    """
    from .narrowphase import _segment_closest_uv

    a, b, c, d = cols
    ab, ac, ad = b - a, c - a, d - a
    u, v, degenerate = _segment_closest_uv(ab, ac, ad)
    if reference_quirks:
        u = jnp.where(degenerate, u, 0.0)
        v = jnp.where(degenerate, v, 0.0)

    q0 = u[:, None] * ab
    q1 = ac + v[:, None] * (ad - ac)
    n = q0 - q1
    dist = jnp.linalg.norm(n, axis=-1)
    n = n / jnp.maximum(dist, 1e-20)[:, None]

    im = inv_mass4
    s = (
        im[:, 0] * (1.0 - u) ** 2
        + im[:, 1] * u**2
        + im[:, 2] * (1.0 - v) ** 2
        + im[:, 3] * v**2
    )
    active = (dist < thickness) & (s > 0.0)
    disp = (thickness - dist)[:, None] * n  # stabilization sign; projection negates
    inv_s = 1.0 / jnp.maximum(s, 1e-20)
    wa = im[:, 0] * (1.0 - u) * inv_s
    wb = im[:, 1] * u * inv_s
    wc = im[:, 2] * (1.0 - v) * inv_s
    wd = im[:, 3] * v * inv_s
    return active, disp, wa, wb, wc, wd


def project_edge_edge(
    positions: jax.Array,
    inv_mass: jax.Array,
    edge_idx: jax.Array,  # i32[E,4]
    thickness: jax.Array,
    reference_quirks: bool,
) -> tuple[jax.Array, jax.Array]:
    """Edge-edge local-step projection
    (``CollisionConstraint.cpp:225-314``): push the two segments apart along
    their closest-point direction, inverse-mass weighted.  The reference
    never generates these constraints (sweep commented out,
    ``Solver.cpp:799-823``); this is the rebuilt capability, gated by
    ``StepConfig.enable_edge_collisions``.

    Returns ``(projected [E,4,3], delta [E,4,3] = projected − gathered)``.
    """
    cols = gather_cols(positions, edge_idx)
    p = jnp.stack(cols, axis=1)
    active, disp, wa, wb, wc, wd = _edge_edge_closest_disp(
        cols, inv_mass[edge_idx], thickness, reference_quirks
    )
    # Sign: the reference's projection uses disp = −(thickness − dist)·n with
    # a,b += and c,d −= (CollisionConstraint.cpp:299-312) — which moves both
    # edges TOWARD each other, the opposite of its own stabilization pass
    # (CollisionConstraint.cpp:385-396).  Dead code in the reference, so the
    # sign bug was never felt; quirk mode reproduces it literally, fixed mode
    # uses the (stabilization-consistent) separating sign.
    sign = -1.0 if reference_quirks else 1.0
    am = active.astype(positions.dtype)[:, None]
    delta = jnp.stack(
        [
            sign * wa[:, None] * disp,
            sign * wb[:, None] * disp,
            -sign * wc[:, None] * disp,
            -sign * wd[:, None] * disp,
        ],
        axis=1,
    ) * am[:, None]
    return p + delta, delta


def stabilize_edge_edge(
    positions: jax.Array,
    prev_positions: jax.Array,
    inv_mass: jax.Array,
    edge_idx: jax.Array,
    edge_mask: jax.Array,
    thickness: jax.Array,
    reference_quirks: bool,
) -> tuple[jax.Array, jax.Array]:
    """One Jacobi pass of edge-edge stabilization
    (``CollisionConstraint.cpp:316-400``): direct push-out applied to
    position *and* prevPosition, count-averaged like the point-tri pass."""
    acc = stabilize_edge_edge_acc(
        positions, inv_mass, edge_idx, edge_mask, thickness, reference_quirks
    )
    delta = acc[:, :3] / jnp.maximum(acc[:, 3], 1.0)[:, None]
    return positions + delta, prev_positions + delta


def stabilize_edge_edge_acc(
    positions: jax.Array,
    inv_mass: jax.Array,
    edge_idx: jax.Array,
    edge_mask: jax.Array,
    thickness: jax.Array,
    reference_quirks: bool,
) -> jax.Array:
    """The edge-edge stabilization pass's raw ``[N, 4]`` accumulator (xyz
    delta sums + contact counts) before count-averaging — halo-reduced
    across slabs by the domain-decomposed solver (parallel/domain.py)."""
    cols = gather_cols(positions, edge_idx)
    active, disp, wa, wb, wc, wd = _edge_edge_closest_disp(
        cols, inv_mass[edge_idx], thickness, reference_quirks
    )
    active = active & (edge_mask > 0)
    am = active.astype(positions.dtype)[:, None]
    upd = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    wa[:, None] * disp * am,
                    wb[:, None] * disp * am,
                    -wc[:, None] * disp * am,
                    -wd[:, None] * disp * am,
                ],
                axis=0,
            ),
            jnp.tile(am[:, 0], 4)[:, None],
        ],
        axis=-1,
    )  # [4E, 4] — one fused scatter (xyz + count), 2-D throughout
    return jnp.zeros(
        (positions.shape[0], 4), positions.dtype
    ).at[edge_idx.T.reshape(-1)].add(upd)


def stabilize_point_tri(
    positions: jax.Array,
    prev_positions: jax.Array,
    inv_mass: jax.Array,
    pt_idx: jax.Array,
    pt_mask: jax.Array,
    thickness: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One Jacobi pass of point-triangle stabilization
    (``CollisionConstraint.cpp:126-162``): mass-weighted push-out applied to
    position *and* prevPosition ("prevents spuriously adding velocity").

    The reference applies constraints sequentially in place; here deltas are
    accumulated and applied at once (deterministic ``scatter-add``), which the
    fidelity suite bounds against the sequential oracle.
    """
    acc = stabilize_point_tri_acc(
        positions, inv_mass, pt_idx, pt_mask, thickness
    )
    delta = acc[:, :3] / jnp.maximum(acc[:, 3], 1.0)[:, None]
    return positions + delta, prev_positions + delta


def stabilize_point_tri_acc(
    positions: jax.Array,
    inv_mass: jax.Array,
    pt_idx: jax.Array,
    pt_mask: jax.Array,
    thickness: jax.Array,
) -> jax.Array:
    """The stabilization pass's raw ``[N, 4]`` accumulator (xyz delta sums +
    contact counts) before count-averaging — the domain-decomposed solver
    halo-reduces this across slabs before applying (parallel/domain.py)."""

    def acc_fn(sl):
        idx = pt_idx[sl]
        mask = pt_mask[sl]
        a, b, c, d = gather_cols(positions, idx)
        n = jnp.cross(c - b, d - b)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        n_dot_p = jnp.sum(n * (a - b), axis=-1)
        active = (n_dot_p < thickness) & (mask > 0)
        disp = jnp.where(active, thickness - n_dot_p, 0.0)[:, None] * n

        im = inv_mass[idx]  # [K,4]
        w_tri = im[:, 1] + im[:, 2] + im[:, 3]
        w_sum = im[:, 0] + w_tri
        inv_w = 1.0 / jnp.maximum(w_sum, 1e-20)
        # Note: each of b, c, d receives the full wTriSum-weighted share
        # (CollisionConstraint.cpp:152-154) — faithful to the reference.
        da = disp * (im[:, 0] * inv_w)[:, None]
        dbcd = -disp * (w_tri * inv_w)[:, None]

        # Count-averaged application: the reference stabilizes sequentially,
        # re-measuring penetration per constraint, so a node shared by k
        # active contacts is pushed ~once, not k times (cf. the friction pass
        # note in solver/pd.py).  Averaging keeps dense piles from
        # overshooting.  One fused scatter op carries all four node columns
        # and the counts (per-op cost ~2.5 ms on v5e dominates row count).
        am = active.astype(positions.dtype)[:, None]
        blk_a = jnp.concatenate([da, am], axis=-1)  # (dx, dy, dz, count)
        blk_t = jnp.concatenate([dbcd, am], axis=-1)
        ui = jnp.concatenate([blk_a, blk_t, blk_t, blk_t], axis=0)
        return (
            jnp.zeros((positions.shape[0], 4), positions.dtype)
            .at[idx.T.reshape(-1)]
            .add(ui)
        )

    # The whole pass (gathers included) runs on the live contact prefix
    # when few contacts are live — see capped_contact_acc.
    return capped_contact_acc(pt_idx, jnp.sum(pt_mask), acc_fn)
