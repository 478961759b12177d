"""Batched constraint projections (the Projective-Dynamics local step).

Each function maps current node positions onto one constraint type's manifold
for the whole padded batch at once, mirroring the per-constraint
``projectToAuxiliaryVariable`` functors of the reference
(``Constraints.cpp``, ``ShapeMatchingConstraint.cpp``) but as single
fixed-shape gather → math → (optional) scatter programs.

Both solvers share these projections exactly as the reference shares
``TProjection`` between ``projectToAuxiliaryVariable`` (PD) and
``projectNodePositions`` (PBD) (``Constraints.h:112-129``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.precision import einsum as _einsum

from ..ops import math3d
from ..topology import BendBatch, DistanceBatch, GroupBatch, PositionBatch, TetBatch


def project_distance(x: jax.Array, batch: DistanceBatch) -> jax.Array:
    """Distance projection with the reference's asymmetric displacement rule
    (``Constraints.cpp:11-37``): only node 0 is moved, by the full
    ``-(rest - dist)·dir``; the degenerate-direction fallback is ``(1,0,0)``
    when ``dist ≤ 1e-5``.

    Returns the projected pair configuration ``f32[C, 2, 3]``.
    """
    pa = x[batch.idx[:, 0]]
    pb = x[batch.idx[:, 1]]
    diff = pb - pa
    dist = jnp.linalg.norm(diff, axis=-1)
    safe = dist > 1e-5
    dir_ = jnp.where(
        safe[:, None],
        diff / jnp.maximum(dist, 1e-20)[:, None],
        jnp.array([1.0, 0.0, 0.0], dtype=x.dtype),
    )
    disp = batch.rest - dist
    proj0 = pa - disp[:, None] * dir_
    return jnp.stack([proj0, pb], axis=1)


def project_distance_delta(x: jax.Array, batch: DistanceBatch) -> jax.Array:
    """The PD force path only consumes ``proj[0] − proj[1]``
    (``AᵀB·p`` reduces to ``0.5·w·(p0 − p1)``, Constraints.cpp:42-47); this
    flat-column form returns exactly that difference as ``f32[C, 3]`` with
    no [C, 2, 3] intermediate (tile-pads its (2, 3) minor dims ~20x).

    ``p0 − p1 = (pa − disp·dir) − pb = −(diff + disp·dir)`` with the same
    asymmetric rule and (1,0,0) degenerate fallback as
    :func:`project_distance`.
    """
    c = batch.idx.shape[0]
    g = x[batch.idx.T.reshape(-1)]  # [2C, 3] one flat gather
    dfx = g[c:, 0] - g[:c, 0]
    dfy = g[c:, 1] - g[:c, 1]
    dfz = g[c:, 2] - g[:c, 2]
    dist = jnp.sqrt(dfx * dfx + dfy * dfy + dfz * dfz)
    safe = dist > 1e-5
    inv = 1.0 / jnp.maximum(dist, 1e-20)
    dirx = jnp.where(safe, dfx * inv, 1.0)
    diry = jnp.where(safe, dfy * inv, 0.0)
    dirz = jnp.where(safe, dfz * inv, 0.0)
    disp = batch.rest - dist
    return jnp.stack(
        [
            -(dfx + disp * dirx),
            -(dfy + disp * diry),
            -(dfz + disp * dirz),
        ],
        axis=-1,
    )


def project_position(batch: PositionBatch) -> jax.Array:
    """Pin to the stored fixed position (``Constraints.cpp:58-63``)."""
    return batch.target


def gather_tet_nodes(x: jax.Array, batch: TetBatch, contiguous: bool) -> jax.Array:
    """Node positions per tet, ``[C,4,3]``.

    ``contiguous=True`` (host-detected element-major layout: ``idx`` is
    exactly arange) turns the random gather into a reshape — TPU random
    gathers run ~30M elem/s, reshapes at full HBM bandwidth."""
    c = batch.idx.shape[0]
    if contiguous:
        return jax.lax.dynamic_slice_in_dim(x, 0, 4 * c).reshape(c, 4, 3)
    return x[batch.idx]


def _deformation_gradient(
    x: jax.Array, batch: TetBatch, contiguous: bool = False
) -> jax.Array:
    """``F = P·Qinv`` with P's columns the current edges
    (``Constraints.cpp:85-91``)."""
    p = gather_tet_nodes(x, batch, contiguous)  # [C,4,3]
    edges = jnp.stack(
        [p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]], axis=-1
    )  # [C,3,3] columns = edges
    return _einsum("cij,cjk->cik", edges, batch.qinv3())


def _projected_from_fhat(fhat: jax.Array) -> jax.Array:
    """Pack ``(0, F̂·e₁, F̂·e₂, F̂·e₃)`` as the projected configuration
    (``Constraints.cpp:124-127``) — differential coordinates with node 0 at
    the origin."""
    zero = jnp.zeros_like(fhat[..., :, 0])
    return jnp.stack(
        [zero, fhat[..., :, 0], fhat[..., :, 1], fhat[..., :, 2]], axis=-2
    )


def project_strain(
    x: jax.Array, batch: TetBatch, contiguous: bool = False
) -> jax.Array:
    """Strain-limiting projection (``Constraints.cpp:76-128``): clamp the
    singular values of F to ``[minStrain, maxStrain]``, negating σ₃ when the
    element is inverted (``det F < 0``).

    Returns ``f32[C, 4, 3]``.
    """
    f = _deformation_gradient(x, batch, contiguous)
    u, sigma, v = math3d.svd3x3(f)
    s_hat = jnp.clip(sigma, batch.lo[:, None], batch.hi[:, None])
    inverted = math3d.det3x3(f) < 0.0
    s_hat = s_hat.at[:, 2].multiply(jnp.where(inverted, -1.0, 1.0))
    fhat = _einsum("cij,cj,ckj->cik", u, s_hat, v)
    return _projected_from_fhat(fhat)


def project_distance_delta_dense(
    x: jax.Array, batch: DistanceBatch, dmat: jax.Array
) -> jax.Array:
    """Small-scene twin of :func:`project_distance_delta`: the endpoint
    difference comes from ONE MXU matmul against the dense incidence matrix
    (``Topology.dist_dense``) instead of a 2C-row gather — tiny ticks are
    bound by per-op overhead, not FLOPs."""
    diff = _einsum("cn,nd->cd", dmat, x)  # [C, 3] = x[idx1] − x[idx0]
    dfx, dfy, dfz = diff[:, 0], diff[:, 1], diff[:, 2]
    dist = jnp.sqrt(dfx * dfx + dfy * dfy + dfz * dfz)
    safe = dist > 1e-5
    inv = 1.0 / jnp.maximum(dist, 1e-20)
    dirx = jnp.where(safe, dfx * inv, 1.0)
    diry = jnp.where(safe, dfy * inv, 0.0)
    dirz = jnp.where(safe, dfz * inv, 0.0)
    disp = batch.rest - dist
    return jnp.stack(
        [
            -(dfx + disp * dirx),
            -(dfy + disp * diry),
            -(dfz + disp * dirz),
        ],
        axis=-1,
    )


def _compute_d(sigma: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Additive singular-value correction driving ``∏(σ+D)`` into
    ``[minΩ, maxΩ]`` by 10 fixed Newton-like iterations — a transcription of
    ``computeD`` (``Constraints.cpp:186-203``)."""
    d = jnp.zeros_like(sigma)
    for _ in range(10):
        spd = sigma + d
        product = spd[:, 0] * spd[:, 1] * spd[:, 2]
        omega = jnp.clip(product, lo, hi)
        c = product - omega
        grad = jnp.stack(
            [spd[:, 1] * spd[:, 2], spd[:, 0] * spd[:, 2], spd[:, 0] * spd[:, 1]],
            axis=-1,
        )
        gg = jnp.sum(grad * grad, axis=-1)
        gd = jnp.sum(grad * d, axis=-1)
        d = ((gd - c) / jnp.maximum(gg, 1e-20))[:, None] * grad
    return d


def project_volume(
    x: jax.Array, batch: TetBatch, contiguous: bool = False
) -> jax.Array:
    """Volume-preservation projection (``Constraints.cpp:205-255``)."""
    f = _deformation_gradient(x, batch, contiguous)
    u, sigma, v = math3d.svd3x3(f)
    s_hat = sigma + _compute_d(sigma, batch.lo, batch.hi)
    fhat = _einsum("cij,cj,ckj->cik", u, s_hat, v)
    return _projected_from_fhat(fhat)


def _compute_d_flat(sigma, lo, hi):
    """Flat twin of :func:`_compute_d` on a 3-tuple of [C] arrays."""
    d = tuple(jnp.zeros_like(s) for s in sigma)
    for _ in range(10):
        spd = tuple(s + dd for s, dd in zip(sigma, d))
        product = spd[0] * spd[1] * spd[2]
        omega = jnp.clip(product, lo, hi)
        c = product - omega
        grad = (spd[1] * spd[2], spd[0] * spd[2], spd[0] * spd[1])
        gg = grad[0] ** 2 + grad[1] ** 2 + grad[2] ** 2
        gd = grad[0] * d[0] + grad[1] * d[1] + grad[2] * d[2]
        scale = (gd - c) / jnp.maximum(gg, 1e-20)
        d = tuple(scale * g for g in grad)
    return d


def tet_force12(
    x: jax.Array,
    batch: TetBatch,
    kind: str,  # "strain" | "volume"
    contiguous: bool = False,
) -> jax.Array:
    """Per-tet force contribution ``w·AᵀB·p̂`` as a flat ``[C, 12]`` array
    (columns ``a*3+d`` = corner a, axis d) — the entire deformation-gradient
    / SVD / clamp / reconstruction / Gᵀ chain in structure-of-columns form.

    Mathematically identical to ``project_strain``/``project_volume``
    followed by the force einsum, but with no [C,3,3]/[C,4,3] buffers: on
    TPU those tile-pad ~40-100x and every kernel boundary touching one
    measured ~1.3 ms at stress scale (the local step's dominant cost).
    """
    c = batch.idx.shape[0]
    if contiguous:
        cols = [
            jax.lax.slice(x, (a, 0), (4 * c, 3), (4, 1)) for a in range(4)
        ]
    else:
        from ..collision.batches import gather_cols

        cols = list(gather_cols(x, batch.idx))
    p = [[cols[a][:, d] for d in range(3)] for a in range(4)]
    e = [[p[k + 1][d] - p[0][d] for d in range(3)] for k in range(3)]

    qf = tuple(batch.qinv[r] for r in range(9))  # flat rows, index 3i+j
    # F[d, j] = Σ_k edges[d, k] · qinv[k, j]
    f = tuple(
        e[0][d] * qf[0 + j] + e[1][d] * qf[3 + j] + e[2][d] * qf[6 + j]
        for d in range(3)
        for j in range(3)
    )
    u, sigma, v = math3d.svd3x3_flat(f)

    if kind == "strain":
        s_hat = [jnp.clip(s, batch.lo, batch.hi) for s in sigma]
        inverted = math3d.det3x3_flat(f) < 0.0
        s_hat[2] = s_hat[2] * jnp.where(inverted, -1.0, 1.0)
    else:
        dcorr = _compute_d_flat(sigma, batch.lo, batch.hi)
        s_hat = [s + dd for s, dd in zip(sigma, dcorr)]

    # F̂[d, j] = Σ_k u[d, k] · ŝ_k · v[j, k]
    fhat = tuple(
        u[3 * d + 0] * s_hat[0] * v[3 * j + 0]
        + u[3 * d + 1] * s_hat[1] * v[3 * j + 1]
        + u[3 * d + 2] * s_hat[2] * v[3 * j + 2]
        for d in range(3)
        for j in range(3)
    )

    # contrib[a, d] = w · Σ_j g[j, a] · F̂[d, j]
    g = batch.g  # [12, C] flat, row 4j+a
    out = []
    for a in range(4):
        ga = [g[4 * j + a] for j in range(3)]
        for d in range(3):
            out.append(
                batch.w
                * (
                    ga[0] * fhat[3 * d + 0]
                    + ga[1] * fhat[3 * d + 1]
                    + ga[2] * fhat[3 * d + 2]
                )
            )
    return jnp.stack(out, axis=-1)  # [C, 12]


def tet_force12_fused(
    x: jax.Array,
    strain: TetBatch,
    volume: TetBatch,
    contiguous: bool = False,
) -> jax.Array:
    """Combined strain+volume force ``w_s·AᵀB·p̂_s + w_v·AᵀB·p̂_v`` as one
    flat ``[C, 12]`` array, for scenes where both constraints cover the SAME
    tets (the reference's ``addTriMeshVolume``/``createTetBox`` emit one of
    each per tet, ``PrimitiveUtilities.cpp:287-316``; identical ``A``
    construction ``Constraints.cpp:130-184`` vs ``257-310`` means identical
    ``qinv``/``g``).

    Versus two :func:`tet_force12` calls this shares the position slices,
    deformation gradient and the 3x3 SVD (the local step's dominant cost),
    folds both weights before ONE ``g`` application, and emits ONE [C, 12]
    buffer — halving the per-iteration reshape + scatter traffic.
    """
    c = strain.idx.shape[0]
    if contiguous:
        cols = [
            jax.lax.slice(x, (a, 0), (4 * c, 3), (4, 1)) for a in range(4)
        ]
    else:
        from ..collision.batches import gather_cols

        cols = list(gather_cols(x, strain.idx))
    p = [[cols[a][:, d] for d in range(3)] for a in range(4)]
    return jnp.stack(tet_force12_fused_cols(p, strain, volume), axis=-1)


def tet_force12_fused_cols(p, strain: TetBatch, volume: TetBatch):
    """Column-space core of :func:`tet_force12_fused`: corner positions come
    in as ``p[a][d]`` columns (4 corners x 3 axes of ``f32[C]``) and the
    combined strain+volume force ``w_s·AᵀB·p̂_s + w_v·AᵀB·p̂_v`` goes out as a
    list of 12 ``f32[C]`` columns (index ``3a + d``) — no stacked 2-D buffer
    at either end, so the tet-column PD fast path (solver/tetcols.py) keeps
    the whole iteration in flat columns."""
    e = [[p[k + 1][d] - p[0][d] for d in range(3)] for k in range(3)]

    qf = tuple(strain.qinv[r] for r in range(9))  # flat rows, index 3i+j
    f = tuple(
        e[0][d] * qf[0 + j] + e[1][d] * qf[3 + j] + e[2][d] * qf[6 + j]
        for d in range(3)
        for j in range(3)
    )
    u, sigma, v = math3d.svd3x3_flat(f)

    s_strain = [jnp.clip(s, strain.lo, strain.hi) for s in sigma]
    inverted = math3d.det3x3_flat(f) < 0.0
    s_strain[2] = s_strain[2] * jnp.where(inverted, -1.0, 1.0)
    dcorr = _compute_d_flat(sigma, volume.lo, volume.hi)
    s_volume = [s + dd for s, dd in zip(sigma, dcorr)]
    # Weighted combination BEFORE reconstruction: both constraints share U/V,
    # so w_s·Û Ŝ_s Vᵀ + w_v·Û Ŝ_v Vᵀ = Û (w_s·Ŝ_s + w_v·Ŝ_v) Vᵀ.
    s_comb = [
        strain.w * ss + volume.w * sv for ss, sv in zip(s_strain, s_volume)
    ]
    fhat = tuple(
        u[3 * d + 0] * s_comb[0] * v[3 * j + 0]
        + u[3 * d + 1] * s_comb[1] * v[3 * j + 1]
        + u[3 * d + 2] * s_comb[2] * v[3 * j + 2]
        for d in range(3)
        for j in range(3)
    )

    g = strain.g  # [12, C] flat, row 4j+a
    out = []
    for a in range(4):
        ga = [g[4 * j + a] for j in range(3)]
        for d in range(3):
            out.append(
                ga[0] * fhat[3 * d + 0]
                + ga[1] * fhat[3 * d + 1]
                + ga[2] * fhat[3 * d + 2]
            )
    return out  # 12 x [C], index 3a + d


def project_bend(
    x: jax.Array, inv_mass: jax.Array, batch: BendBatch
) -> jax.Array:
    """Dihedral-angle projection per the PBD 2007 paper, Appendix A — a
    transcription of ``Constraints.cpp:312-366``.  Degenerate triangles
    (``qSquaredSum < 1e-5``) leave positions untouched, matching the
    reference's early return; the reference's un-guarded normal divisions
    (TODO at ``Constraints.cpp:332``) are guarded here with a tiny epsilon.

    Returns ``f32[C, 4, 3]``.
    """
    p = x[batch.idx]
    wim = inv_mass[batch.idx]  # [C,4]
    p2 = p[:, 1] - p[:, 0]
    p3 = p[:, 2] - p[:, 0]
    p4 = p[:, 3] - p[:, 0]
    c23 = jnp.cross(p2, p3)
    c24 = jnp.cross(p2, p4)
    l23 = jnp.maximum(jnp.linalg.norm(c23, axis=-1), 1e-20)
    l24 = jnp.maximum(jnp.linalg.norm(c24, axis=-1), 1e-20)
    n1 = c23 / l23[:, None]
    n2 = c24 / l24[:, None]
    d = jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0)
    c = jnp.arccos(d) - batch.rest_angle

    q3 = (jnp.cross(p2, n2) + jnp.cross(n1, p2) * d[:, None]) / l23[:, None]
    q4 = (jnp.cross(p2, n1) + jnp.cross(n2, p2) * d[:, None]) / l24[:, None]
    q2 = (
        -(jnp.cross(p3, n2) + jnp.cross(n1, p3) * d[:, None]) / l23[:, None]
        - (jnp.cross(p4, n1) + jnp.cross(n2, p4) * d[:, None]) / l24[:, None]
    )
    q1 = -q2 - q3 - q4
    q = jnp.stack([q1, q2, q3, q4], axis=1)  # [C,4,3]

    w_sum = jnp.sum(wim, axis=-1)
    q_sq = jnp.sum(q * q, axis=(-1, -2))
    num = jnp.sqrt(jnp.maximum(1.0 - d * d, 0.0)) * c
    scale = jnp.where(
        q_sq < 1e-5,
        jnp.zeros_like(q_sq),
        num / jnp.maximum(q_sq, 1e-20),
    )
    delta = (
        -q
        * (4.0 * wim / jnp.maximum(w_sum, 1e-20)[:, None])[..., None]
        * scale[:, None, None]
    )
    return p + delta


def shape_group_moments(
    x: jax.Array, mass: jax.Array, batch: GroupBatch
) -> tuple[jax.Array, jax.Array]:
    """Per-group COM and mass-weighted moment matrix via ONE fused
    ``segment_sum`` (replacing the accumulation loops at
    ``ShapeMatchingConstraint.cpp:98-111``).

    COM uses equal weights ``1/count`` (reference quirk: COM is not
    mass-weighted while the moment matrix is).

    The moment is expanded around the origin so it shares the COM's scatter:
    ``Σ m·(x−com)·matᵀ = Σ m·x·matᵀ − com·(Σ m·mat)ᵀ``.  Everything stays
    2-D ([M, 15] member columns, [G, …] group columns) — a materialized
    [M, 3, 3] outer-product buffer tile-pads its minor dims to (8, 128) on
    TPU (measured 10-40x tax; see PLAN.md cost model), and the previous
    two-scatter form paid that plus a second ~1.5 ms fixed scatter cost.
    """
    g = batch.num_groups
    xg = x[batch.node_idx] * batch.member_mask[:, None]  # [M,3]
    m = mass[batch.node_idx] * batch.member_mask  # [M]
    mx = m[:, None] * xg  # [M,3]
    # Columns: pos (3, for COM) | m·x_i·mat_j (9) | m·mat_j (3).
    cols = [xg]
    cols += [
        mx[:, i : i + 1] * batch.mat_coords[:, j : j + 1]
        for i in range(3)
        for j in range(3)
    ]
    cols.append(m[:, None] * batch.mat_coords)
    s = jax.ops.segment_sum(
        jnp.concatenate(cols, axis=-1), batch.group_idx, num_segments=g
    )  # [G, 15]
    com = s[:, :3] * batch.inv_count[:, None]
    p = s[:, 3:12].reshape(g, 3, 3) - com[:, :, None] * s[:, 12:15][:, None, :]
    return com, p


def project_shape(
    x: jax.Array,
    mass: jax.Array,
    quats: jax.Array,
    batch: GroupBatch,
    rotation_iterations: int,
) -> tuple[jax.Array, jax.Array]:
    """Shape-matching projection (``ShapeMatchingConstraint.cpp:96-122``).

    Returns ``(projected_member_positions f32[M,3], updated_quats f32[G,4])``.
    The quaternion state is the reference's persistent ``_currentRotation``
    warm start.
    """
    com, p = shape_group_moments(x, mass, batch)
    f = _einsum("gij,gjk->gik", p, batch.qinv)
    # Guard padded/degenerate groups: keep the identity-seeded quat stable.
    safe_f = jnp.where(
        batch.group_mask[:, None, None] > 0,
        f,
        jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), f.shape),
    )
    quats = math3d.extract_rotation(safe_f, quats, rotation_iterations)
    r = math3d.quat_to_mat(quats)
    # Flat member-side application: gather the 9 rotation entries as one
    # [M, 9] row gather and combine per column — no [M, 3, 3] intermediate
    # (tile-pads 10-40x; see shape_group_moments).
    rg9 = r.reshape(r.shape[0], 9)[batch.group_idx]  # [M,9]
    mat = batch.mat_coords
    comg = com[batch.group_idx]
    projected = jnp.stack(
        [
            rg9[:, 3 * i + 0] * mat[:, 0]
            + rg9[:, 3 * i + 1] * mat[:, 1]
            + rg9[:, 3 * i + 2] * mat[:, 2]
            + comg[:, i]
            for i in range(3)
        ],
        axis=-1,
    )
    return projected, quats


def project_goal(batch: GroupBatch) -> jax.Array:
    """Goal-matching projection (``ShapeMatchingConstraint.cpp:162-173``):
    ``p = T · (mat, 1)`` with the per-group 4x4 transform updated by the host
    (``updateFixedRegions``, ``PrimitiveUtilities.cpp:114-128``)."""
    g = batch.transforms.shape[0]
    t16 = batch.transforms.reshape(g, 16)[batch.group_idx]  # [M,16] flat
    mat = batch.mat_coords
    return jnp.stack(
        [
            t16[:, 4 * i + 0] * mat[:, 0]
            + t16[:, 4 * i + 1] * mat[:, 1]
            + t16[:, 4 * i + 2] * mat[:, 2]
            + t16[:, 4 * i + 3]
            for i in range(3)
        ],
        axis=-1,
    )
