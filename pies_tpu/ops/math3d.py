"""Batched small-matrix linear algebra for the constraint kernels.

The reference leans on Eigen for three numerical primitives that have no
TPU-friendly library form:

* 3x3 ``JacobiSVD`` per tetrahedron per solver iteration
  (``Constraints.cpp:97-99,225-227``) — replaced by :func:`svd3x3`, a fixed
  number of cyclic Jacobi sweeps on ``FᵀF`` batched over all tets.
* Müller-style iterative rotation extraction for shape matching
  (``ShapeMatchingConstraint.cpp:75-94``) — replaced by
  :func:`extract_rotation`, the same quaternion iteration under a fixed-trip
  ``fori_loop`` (the update is masked to a no-op once converged, so a fixed
  count matches the reference's early ``break``).
* Small ``glm`` inverses/determinants — :func:`det3x3` / :func:`inv3x3`.

Everything is shaped ``[..., 3, 3]`` and vectorizes over arbitrary leading
batch dimensions; all control flow is data-independent so the whole module
traces into straight-line XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .precision import einsum as _einsum

_JACOBI_SWEEPS = 8  # cyclic sweeps; 8 reaches float32 roundoff for 3x3


def det3x3(m: jax.Array) -> jax.Array:
    """Determinant of ``[..., 3, 3]``."""
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def inv3x3(m: jax.Array, eps: float = 0.0) -> jax.Array:
    """Inverse of ``[..., 3, 3]`` via the adjugate (matches ``glm::inverse``)."""
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
    if eps:
        det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _jacobi_rotate(s: jax.Array, v: jax.Array, p: int, q: int):
    """One batched Jacobi rotation zeroing ``s[p, q]`` of symmetric ``s``.

    Updates ``s <- Jᵀ s J`` and accumulates ``v <- v J`` with explicit row /
    column arithmetic (cheaper than materializing J and doing 3x3 matmuls).
    """
    app = s[..., p, p]
    aqq = s[..., q, q]
    apq = s[..., p, q]

    # Stable rotation angle: tan(2θ) = 2 apq / (app - aqq)
    tiny = jnp.asarray(1e-20, dtype=s.dtype)
    tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < tiny, tiny, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < tiny, jnp.zeros_like(t), t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    sn = t * c
    cN = c[..., None]
    snN = sn[..., None]

    sp = s[..., p, :]
    sq = s[..., q, :]
    new_p = cN * sp - snN * sq
    new_q = snN * sp + cN * sq
    s = s.at[..., p, :].set(new_p).at[..., q, :].set(new_q)
    sp = s[..., :, p]
    sq = s[..., :, q]
    new_p = cN * sp - snN * sq
    new_q = snN * sp + cN * sq
    s = s.at[..., :, p].set(new_p).at[..., :, q].set(new_q)
    # Re-symmetrize the zeroed element exactly.
    s = s.at[..., p, q].set(0.0).at[..., q, p].set(0.0)

    vp = v[..., :, p]
    vq = v[..., :, q]
    v = v.at[..., :, p].set(cN * vp - snN * vq).at[..., :, q].set(
        snN * vp + cN * vq
    )
    return s, v


def eigh3x3(s: jax.Array, sweeps: int = _JACOBI_SWEEPS):
    """Eigendecomposition of symmetric ``[..., 3, 3]``: ``s = V Λ Vᵀ``.

    Returns eigenvalues sorted descending and ``V`` with matching columns
    (``det V = +1`` up to the sorting permutation's sign).
    """
    v = jnp.broadcast_to(jnp.eye(3, dtype=s.dtype), s.shape)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            s, v = _jacobi_rotate(s, v, p, q)
    w = jnp.stack([s[..., 0, 0], s[..., 1, 1], s[..., 2, 2]], axis=-1)

    # Sorting network for 3 (eigenvalue, column) pairs, descending.
    def swap_if(w, v, i, j):
        do = w[..., i] < w[..., j]
        wi, wj = w[..., i], w[..., j]
        w = w.at[..., i].set(jnp.where(do, wj, wi)).at[..., j].set(
            jnp.where(do, wi, wj)
        )
        vi, vj = v[..., :, i], v[..., :, j]
        v = v.at[..., :, i].set(jnp.where(do[..., None], vj, vi)).at[..., :, j].set(
            jnp.where(do[..., None], vi, vj)
        )
        return w, v

    w, v = swap_if(w, v, 0, 1)
    w, v = swap_if(w, v, 1, 2)
    w, v = swap_if(w, v, 0, 1)
    return w, v


def svd3x3(f: jax.Array, sweeps: int = _JACOBI_SWEEPS):
    """Batched SVD of ``[..., 3, 3]``: ``f = U diag(σ) Vᵀ``.

    Matches the contract of Eigen's ``JacobiSVD`` as used by the reference
    (``Constraints.cpp:97-99``): σ sorted descending and non-negative; U, V
    orthogonal but not necessarily proper rotations (reflections carry the
    sign of ``det f``).  Rank-deficient inputs get an orthonormal completion
    of U.
    """
    w, v = eigh3x3(_einsum("...ji,...jk->...ik", f, f), sweeps=sweeps)
    sigma = jnp.sqrt(jnp.maximum(w, 0.0))

    fv = _einsum("...ij,...jk->...ik", f, v)  # = U diag(σ)
    eps = jnp.asarray(1e-12, dtype=f.dtype)
    u0 = fv[..., :, 0] / jnp.maximum(sigma[..., 0, None], eps)
    u1 = fv[..., :, 1] / jnp.maximum(sigma[..., 1, None], eps)
    u2 = fv[..., :, 2] / jnp.maximum(sigma[..., 2, None], eps)

    def _normalize(x, fallback):
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        ok = n > 1e-6
        return jnp.where(ok, x / jnp.maximum(n, eps), fallback)

    ex = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = _normalize(u0, ex)
    # Orthonormal completion for (near-)rank-deficient inputs.
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0
    u1 = _normalize(u1, _perp(u0))
    u2_raw = u2 - jnp.sum(u2 * u0, axis=-1, keepdims=True) * u0
    u2_raw = u2_raw - jnp.sum(u2_raw * u1, axis=-1, keepdims=True) * u1
    # Reflection-preserving fallback: sign(det f) picks the handedness the
    # true U would have (σ≥0 ⇒ det U · det V = sign(det f); det V from Jacobi
    # is ±1 by permutation parity, already baked into fv's columns).
    detf = det3x3(f)
    detv = det3x3(v)
    cross = jnp.cross(u0, u1) * (jnp.sign(detf * detv) + (detf == 0))[..., None]
    u2 = _normalize(u2_raw, cross)
    u = jnp.stack([u0, u1, u2], axis=-1)
    return u, sigma, v


def _perp(x: jax.Array) -> jax.Array:
    """Any unit vector orthogonal to unit ``x`` (branch-free)."""
    # Pick the axis least aligned with x, project out, normalize.
    ax = jnp.abs(x)
    use_x = jnp.logical_and(ax[..., 0] <= ax[..., 1], ax[..., 0] <= ax[..., 2])
    use_y = jnp.logical_and(~use_x, ax[..., 1] <= ax[..., 2])
    e = jnp.zeros_like(x)
    e = e.at[..., 0].set(use_x.astype(x.dtype))
    e = e.at[..., 1].set(use_y.astype(x.dtype))
    e = e.at[..., 2].set((~jnp.logical_or(use_x, use_y)).astype(x.dtype))
    p = e - jnp.sum(e * x, axis=-1, keepdims=True) * x
    return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Flat (structure-of-columns) 3x3 pipeline
#
# A "matrix" is a tuple of nine [...]-shaped arrays, row-major (m[3*i+j]).
# On TPU a materialized [C, 3, 3] buffer tile-pads its (3, 3) minor dims to
# (8, 128) — ~100x wasted lanes, measured ~1.3 ms per kernel boundary at
# C = 125k.  The flat form keeps every element a clean 1-D array, so the
# whole SVD/projection chain fuses into a few full-bandwidth kernels.
# Semantics mirror the [..., 3, 3] functions above exactly.
# ---------------------------------------------------------------------------


def flatten3x3(m: jax.Array):
    """[..., 3, 3] -> 9-tuple (one fused multi-output read of the buffer)."""
    return tuple(m[..., i, j] for i in range(3) for j in range(3))


def det3x3_flat(m):
    return (
        m[0] * (m[4] * m[8] - m[5] * m[7])
        - m[1] * (m[3] * m[8] - m[5] * m[6])
        + m[2] * (m[3] * m[7] - m[4] * m[6])
    )


def matmul_flat(a, b):
    """(ab)[i,j] = sum_k a[i,k] b[k,j] on 9-tuples."""
    return tuple(
        a[3 * i + 0] * b[0 + j] + a[3 * i + 1] * b[3 + j] + a[3 * i + 2] * b[6 + j]
        for i in range(3)
        for j in range(3)
    )


def _jacobi_rotate_flat(s, v, p: int, q: int):
    """Flat twin of :func:`_jacobi_rotate` (same formulas and order)."""
    s = list(s)
    v = list(v)
    app, aqq, apq = s[3 * p + p], s[3 * q + q], s[3 * p + q]
    tiny = jnp.asarray(1e-20, dtype=app.dtype)
    tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < tiny, tiny, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < tiny, jnp.zeros_like(t), t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    sn = t * c

    for r in range(3):  # rows p, q
        sp, sq = s[3 * p + r], s[3 * q + r]
        s[3 * p + r] = c * sp - sn * sq
        s[3 * q + r] = sn * sp + c * sq
    for r in range(3):  # cols p, q
        sp, sq = s[3 * r + p], s[3 * r + q]
        s[3 * r + p] = c * sp - sn * sq
        s[3 * r + q] = sn * sp + c * sq
    zero = jnp.zeros_like(s[0])
    s[3 * p + q] = zero
    s[3 * q + p] = zero

    for r in range(3):
        vp, vq = v[3 * r + p], v[3 * r + q]
        v[3 * r + p] = c * vp - sn * vq
        v[3 * r + q] = sn * vp + c * vq
    return tuple(s), tuple(v)


def eigh3x3_flat(s, sweeps: int = _JACOBI_SWEEPS):
    """Flat twin of :func:`eigh3x3`: returns (w 3-tuple, v 9-tuple)."""
    one = jnp.ones_like(s[0])
    zero = jnp.zeros_like(s[0])
    v = (one, zero, zero, zero, one, zero, zero, zero, one)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            s, v = _jacobi_rotate_flat(s, v, p, q)
    w = [s[0], s[4], s[8]]
    v = list(v)

    def swap_if(i, j):
        do = w[i] < w[j]
        w[i], w[j] = (
            jnp.where(do, w[j], w[i]),
            jnp.where(do, w[i], w[j]),
        )
        for r in range(3):
            vi, vj = v[3 * r + i], v[3 * r + j]
            v[3 * r + i] = jnp.where(do, vj, vi)
            v[3 * r + j] = jnp.where(do, vi, vj)

    swap_if(0, 1)
    swap_if(1, 2)
    swap_if(0, 1)
    return tuple(w), tuple(v)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def svd3x3_flat(f, sweeps: int = _JACOBI_SWEEPS):
    """Flat twin of :func:`svd3x3`: f (9-tuple) -> (u 9-tuple, sigma
    3-tuple, v 9-tuple), same contract."""
    # s = fᵀ f
    s = tuple(
        f[0 + i] * f[0 + k] + f[3 + i] * f[3 + k] + f[6 + i] * f[6 + k]
        for i in range(3)
        for k in range(3)
    )
    w, v = eigh3x3_flat(s, sweeps=sweeps)
    sigma = tuple(jnp.sqrt(jnp.maximum(wk, 0.0)) for wk in w)

    eps = jnp.asarray(1e-12, dtype=f[0].dtype)
    # fv columns = U diag(σ)
    def col(mat, j):
        return (mat[0 + j], mat[3 + j], mat[6 + j])

    fv = matmul_flat(f, v)
    u_cols = []
    for j in range(3):
        cj = col(fv, j)
        inv = 1.0 / jnp.maximum(sigma[j], eps)
        u_cols.append(tuple(x * inv for x in cj))

    def normalize(x, fallback):
        n = jnp.sqrt(_dot3(x, x))
        ok = n > 1e-6
        inv = 1.0 / jnp.maximum(n, eps)
        return tuple(jnp.where(ok, xi * inv, fi) for xi, fi in zip(x, fallback))

    ex = (jnp.ones_like(sigma[0]), jnp.zeros_like(sigma[0]), jnp.zeros_like(sigma[0]))
    u0 = normalize(u_cols[0], ex)
    d10 = _dot3(u_cols[1], u0)
    u1r = tuple(x - d10 * y for x, y in zip(u_cols[1], u0))
    u1 = normalize(u1r, _perp_flat(u0))
    d20 = _dot3(u_cols[2], u0)
    u2r = tuple(x - d20 * y for x, y in zip(u_cols[2], u0))
    d21 = _dot3(u2r, u1)
    u2r = tuple(x - d21 * y for x, y in zip(u2r, u1))
    detf = det3x3_flat(f)
    detv = det3x3_flat(v)
    sgn = jnp.sign(detf * detv) + (detf == 0)
    crs = tuple(x * sgn for x in _cross3(u0, u1))
    u2 = normalize(u2r, crs)
    u = (
        u0[0], u1[0], u2[0],
        u0[1], u1[1], u2[1],
        u0[2], u1[2], u2[2],
    )
    return u, sigma, v


def _perp_flat(x):
    """Flat twin of :func:`_perp` for a unit 3-vector tuple."""
    ax = tuple(jnp.abs(xi) for xi in x)
    use_x = jnp.logical_and(ax[0] <= ax[1], ax[0] <= ax[2])
    use_y = jnp.logical_and(~use_x, ax[1] <= ax[2])
    dt = x[0].dtype
    e = (
        use_x.astype(dt),
        use_y.astype(dt),
        (~jnp.logical_or(use_x, use_y)).astype(dt),
    )
    d = _dot3(e, x)
    p = tuple(ei - d * xi for ei, xi in zip(e, x))
    n = jnp.sqrt(_dot3(p, p))
    inv = 1.0 / jnp.maximum(n, 1e-12)
    return tuple(pi * inv for pi in p)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z) and Müller rotation extraction
# ---------------------------------------------------------------------------


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix ``[..., 3, 3]``."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def quat_from_axis_angle(angle: jax.Array, axis: jax.Array) -> jax.Array:
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], s[..., None] * axis], axis=-1
    )


def extract_rotation(a: jax.Array, q: jax.Array, iterations: int) -> jax.Array:
    """Rotational part of ``a`` by Müller et al.'s warm-started iteration.

    Transcribes the semantics of ``extractRotation``
    (``ShapeMatchingConstraint.cpp:75-94``): per iteration compute the torque
    ``ω = Σᵢ R·eᵢ × A·eᵢ / (|Σᵢ R·eᵢ · A·eᵢ| + 1e-9)`` and rotate ``q`` about
    ``ω``.  The reference breaks when ``|ω| < 1e-9``; here the update is
    masked instead, so a fixed trip count under ``fori_loop`` is equivalent.
    The reference runs this in float64; float32 plus the warm start across
    ticks keeps the drift below render precision (validated in tests).
    """

    def body(_, q):
        r = quat_to_mat(q)
        num = jnp.cross(r[..., :, 0], a[..., :, 0], axis=-1)
        num = num + jnp.cross(r[..., :, 1], a[..., :, 1], axis=-1)
        num = num + jnp.cross(r[..., :, 2], a[..., :, 2], axis=-1)
        den = (
            jnp.sum(r[..., :, 0] * a[..., :, 0], axis=-1)
            + jnp.sum(r[..., :, 1] * a[..., :, 1], axis=-1)
            + jnp.sum(r[..., :, 2] * a[..., :, 2], axis=-1)
        )
        omega = num * (1.0 / jnp.abs(den) + 1e-9)[..., None]
        w = jnp.linalg.norm(omega, axis=-1)
        converged = w < 1e-9
        axis = omega / jnp.maximum(w, 1e-20)[..., None]
        dq = quat_from_axis_angle(w, axis)
        q_new = quat_mul(dq, q)
        q_new = q_new / jnp.maximum(
            jnp.linalg.norm(q_new, axis=-1, keepdims=True), 1e-20
        )
        return jnp.where(converged[..., None], q, q_new)

    return jax.lax.fori_loop(0, iterations, body, q)
