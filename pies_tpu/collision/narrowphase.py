"""Vectorized continuous collision detection (narrowphase).

Transcribes ``Pies::CollisionDetection`` (``CollisionDetection.cpp``) into
branch-free batched kernels: the point-triangle CCD with its plane-crossing
early-out and t=0 proximity acceptance (``CollisionDetection.cpp:227-302``),
and the (dead-in-reference) edge-edge CCD (``CollisionDetection.cpp:304-418``)
for the non-quirk extension path.

All inputs are relative to a triangle corner, exactly as the caller passes
them (``Solver.cpp:777-788``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from ..ops.cubic import earliest_root_in_unit_interval


def _safe_normalize(v: jax.Array) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _det3v(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """Scalar triple product a·(b×c) — the determinant the reference expands
    term-by-term via ``expandTerm`` (``CollisionDetection.cpp:209-221``)."""
    return jnp.sum(a * jnp.cross(b, c), axis=-1)


def _cols(v: jax.Array):
    """Split a [..., 3] vector array into an (x, y, z) column tuple — the
    flat structure-of-columns form every [...]-shaped op runs dense on
    (trailing dim 3 tile-pads to 128 lanes otherwise; see PLAN.md)."""
    return (v[..., 0], v[..., 1], v[..., 2])


def _cross_c(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot_c(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _det3_c(a, b, c):
    return _dot_c(a, _cross_c(b, c))


def _sub_c(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _lerp_c(a, d, t):
    return (a[0] + t * d[0], a[1] + t * d[1], a[2] + t * d[2])


def _normalize_c(v):
    inv = 1.0 / jnp.maximum(jnp.sqrt(_dot_c(v, v)), 1e-20)
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def _barycentric_inside_c(ab, ac, n, ap) -> jax.Array:
    """Solve ``[ab ac n]·β = ap`` and test the triangle-interior conditions
    (``CollisionDetection.cpp:249-254,293-298``) — Cramer's rule on scalar
    triple products, column form (no [..., 3, 3] matrices, no [..., 3]
    intermediates)."""
    det = _det3_c(ab, ac, n)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    bx = _det3_c(ap, ac, n) * inv_det
    by = _det3_c(ab, ap, n) * inv_det
    ok = det != 0.0
    return (
        ok & (bx >= 0.0) & (bx <= 1.0) & (by >= 0.0) & (by <= 1.0) & (bx + by <= 1.0)
    )


def point_triangle_ccd_cols(
    ap0, ab0, ac0, ap1, ab1, ac1, threshold
) -> tuple[jax.Array, jax.Array]:
    """Column-form ``pointTriangleCCD`` — each argument is an (x, y, z)
    tuple of [...] arrays.  Every intermediate is [...]-shaped, so the VPU
    runs full 128-lane rows instead of 3-of-128 padded [..., 3] tiles."""
    n0 = _normalize_c(_cross_c(ab0, ac0))
    n1 = _normalize_c(_cross_c(ab1, ac1))
    ndp0 = _dot_c(n0, ap0)
    ndp1 = _dot_c(n1, ap1)

    no_cross = ndp0 * ndp1 >= 0.0
    proximity_hit = (
        no_cross
        & (ndp1 >= 0.0)
        & (ndp1 < threshold)
        & _barycentric_inside_c(ab1, ac1, n1, ap1)
    )

    apd = _sub_c(ap1, ap0)
    abd = _sub_c(ab1, ab0)
    acd = _sub_c(ac1, ac0)
    # Coplanarity det(ap(t), ab(t), ac(t)) expanded in t (the six
    # ``expandTerm`` calls, CollisionDetection.cpp:269-274).
    c3 = _det3_c(apd, abd, acd)
    c2 = (
        _det3_c(ap0, abd, acd)
        + _det3_c(apd, ab0, acd)
        + _det3_c(apd, abd, ac0)
    )
    c1 = (
        _det3_c(ap0, ab0, acd)
        + _det3_c(ap0, abd, ac0)
        + _det3_c(apd, ab0, ac0)
    )
    c0 = _det3_c(ap0, ab0, ac0)
    t, found = earliest_root_in_unit_interval(c3, c2, c1, c0)

    apt = _lerp_c(ap0, apd, t)
    abt = _lerp_c(ab0, abd, t)
    act = _lerp_c(ac0, acd, t)
    nt = _normalize_c(_cross_c(abt, act))
    ccd_hit = found & _barycentric_inside_c(abt, act, nt, apt)

    hit = jnp.where(no_cross, proximity_hit, ccd_hit)
    t_out = jnp.where(no_cross, 0.0, jnp.where(ccd_hit, t, 0.0))
    return hit, t_out


def point_triangle_phase1_cols(
    ap0, ab0, ac0, ap1, ab1, ac1, threshold
) -> tuple[jax.Array, jax.Array]:
    """Cheap exact split of ``pointTriangleCCD`` into its two outcomes.

    Returns ``(proximity_hit, crossing)`` where ``proximity_hit`` is the
    reference's t=0 acceptance (point stayed on one side, final distance in
    ``[0, threshold)``, inside the triangle — ``CollisionDetection.cpp:
    237-261``) decided *exactly* here, and ``crossing`` marks lanes whose
    point crossed the triangle plane during the step — only those need the
    coplanarity cubic (``point_triangle_ccd``), and a sign change across
    [0, 1] guarantees the cubic has a root there.

    Rationale: the closed-form cubic costs ~8 transcendentals per lane
    (cbrt x2, arccos, cos x3, sqrt, Newton polish) while crossings are rare
    (a point passes through a candidate plane within one ~12 ms substep);
    evaluating it full-width was the narrowphase hot spot at stress scale.
    ``sign(det(ap0, ab0, ac0)) == sign(n0 . ap0)`` exactly (positive scale
    factor), so no start-side normalization is needed.
    """
    c_start = _det3_c(ap0, ab0, ac0)
    n1 = _normalize_c(_cross_c(ab1, ac1))
    ndp1 = _dot_c(n1, ap1)
    no_cross = c_start * ndp1 >= 0.0
    proximity_hit = (
        no_cross
        & (ndp1 >= 0.0)
        & (ndp1 < threshold)
        & _barycentric_inside_c(ab1, ac1, n1, ap1)
    )
    return proximity_hit, ~no_cross


def point_triangle_phase1_face(
    b0, ab0, ac0, b1, ab1, ac1, corners_prev, corners_now, threshold
):
    """Face-major phase 1: one candidate face tested against MANY points.

    The per-face geometry (start-side cross product, end normal, and the two
    barycentric cross products) is computed once and shared by every corner,
    so a whole face's tests fuse into a single pass over the candidate
    buffer — the per-(corner, face) formulation re-read the 128-lane-padded
    packed rows per combo and was ~4x the HBM traffic.

    ``b0``/``b1`` are the face's base-corner columns at step start/end;
    ``ab/ac`` the relative edge columns; ``corners_*`` lists of absolute
    point-column tuples.  Returns ``[(proximity_hit, crossing), ...]`` per
    corner (same semantics as :func:`point_triangle_phase1_cols`; the
    barycentric ``by`` uses the cyclically permuted triple product
    ``ap . (n x ab)`` — equal in exact arithmetic, ULP-level rounding
    differences from the per-combo form).
    """
    cross0 = _cross_c(ab0, ac0)
    n1 = _normalize_c(_cross_c(ab1, ac1))
    det = _det3_c(ab1, ac1, n1)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    ok = det != 0.0
    cx_acn = _cross_c(ac1, n1)  # det3(ap, ac, n) = ap . (ac x n)
    cx_nab = _cross_c(n1, ab1)  # det3(ab, ap, n) = ap . (n x ab)

    out = []
    for cp, cn in zip(corners_prev, corners_now):
        ap0 = _sub_c(cp, b0)
        ap1 = _sub_c(cn, b1)
        c_start = _dot_c(ap0, cross0)
        ndp1 = _dot_c(n1, ap1)
        no_cross = c_start * ndp1 >= 0.0
        bx = _dot_c(ap1, cx_acn) * inv_det
        by = _dot_c(ap1, cx_nab) * inv_det
        inside = (
            ok
            & (bx >= 0.0) & (bx <= 1.0)
            & (by >= 0.0) & (by <= 1.0)
            & (bx + by <= 1.0)
        )
        prox = no_cross & (ndp1 >= 0.0) & (ndp1 < threshold) & inside
        out.append((prox, ~no_cross))
    return out


def point_triangle_ccd(
    ap0: jax.Array,  # point − corner b, at substep start   [..., 3]
    ab0: jax.Array,  # corner c − corner b, start
    ac0: jax.Array,  # corner d − corner b, start
    ap1: jax.Array,  # same three, at substep end
    ab1: jax.Array,
    ac1: jax.Array,
    threshold: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Batched ``pointTriangleCCD`` (``CollisionDetection.cpp:227-302``).

    Returns ``(hit bool[...], t f32[...])``:

    * if the point stays on one side of the plane the whole step, it still
      hits at t=0 when its final signed distance is in ``[0, threshold)`` and
      it projects inside the triangle;
    * otherwise the coplanarity cubic is solved for the earliest t in [0,1]
      and the barycentric containment is verified at that t.

    Thin wrapper over :func:`point_triangle_ccd_cols` (the slices fuse into
    the consumers; all math runs in flat column form).
    """
    hit, t = point_triangle_ccd_cols(
        _cols(ap0), _cols(ab0), _cols(ac0),
        _cols(ap1), _cols(ab1), _cols(ac1), threshold,
    )
    return hit, t


def _segment_closest_uv(ab, ac, ad, pa=None, pb=None, pc=None, pd=None):
    """Closest-point parameters (u, v) between segments, with the
    reference's degenerate-parallel fallback (``CollisionConstraint.cpp:
    243-287``).  NOTE: the reference's non-degenerate branch *shadows* u/v
    with inner locals, so u = v = 0 is always used (the latent bug at
    ``CollisionConstraint.cpp:253-256``); pass ``quirk=True`` downstream to
    reproduce, or use these correct values for the fixed path.
    """
    cd = ad - ac
    ab_sq = jnp.sum(ab * ab, axis=-1)
    cd_sq = jnp.sum(cd * cd, axis=-1)
    ab_cd = jnp.sum(ab * cd, axis=-1)
    ac_ab = jnp.sum(ac * ab, axis=-1)
    ac_cd = jnp.sum(ac * cd, axis=-1)

    det = ab_sq * -cd_sq + ab_cd * ab_cd
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u_n = (ac_ab * -cd_sq + ab_cd * ac_cd) * inv_det
    v_n = (ab_sq * ac_cd - ac_ab * ab_cd) * inv_det

    # Parallel fallback: project endpoints on ab and overlap the intervals
    # (CollisionConstraint.cpp:257-287 with positions replaced by the
    # relative vectors the CCD variant uses, CollisionDetection.cpp:330-359).
    u0 = jnp.zeros_like(ab_sq)
    u1 = ab_sq
    v0 = ac_ab
    v1 = jnp.sum(ad * ab, axis=-1)
    flip0 = u0 > u1
    flip1 = v0 > v1
    u_lo = jnp.minimum(u0, u1)
    u_hi = jnp.maximum(u0, u1)
    v_lo = jnp.minimum(v0, v1)
    v_hi = jnp.maximum(v0, v1)

    mid = jnp.where(u_lo > v_lo, (u_lo + v_hi) * 0.5, (v_lo + u_hi) * 0.5)
    u_mid = jnp.where(u_lo == u_hi, 0.5, (mid - u_lo) / jnp.where(u_hi == u_lo, 1.0, u_hi - u_lo))
    v_mid = jnp.where(v_lo == v_hi, 0.5, (mid - v_lo) / jnp.where(v_hi == v_lo, 1.0, v_hi - v_lo))

    disjoint_a = u_lo >= v_hi
    disjoint_b = v_lo >= u_hi
    u_par = jnp.where(
        disjoint_a,
        jnp.where(flip0, 1.0, 0.0),
        jnp.where(disjoint_b, jnp.where(flip0, 0.0, 1.0), u_mid),
    )
    v_par = jnp.where(
        disjoint_a,
        jnp.where(flip1, 0.0, 1.0),
        jnp.where(disjoint_b, jnp.where(flip1, 1.0, 0.0), v_mid),
    )

    degenerate = det == 0.0
    u = jnp.where(degenerate, u_par, u_n)
    v = jnp.where(degenerate, v_par, v_n)
    return jnp.clip(u, 0.0, 1.0), jnp.clip(v, 0.0, 1.0), degenerate


def edge_edge_ccd(
    ab0, ac0, ad0, ab1, ac1, ad1, *, quirk: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Batched ``edgeEdgeCCD`` (``CollisionDetection.cpp:304-418``).

    Dead in the reference (generation commented out, ``Solver.cpp:799-823``)
    but implemented for parity of capability.  ``quirk=True`` reproduces the
    u/v shadowing bug (non-degenerate closest-point always evaluated at
    u = v = 0, ``CollisionDetection.cpp:328-329``); ``quirk=False`` uses the
    intended closest-point parameters.
    """
    u, v, degenerate = _segment_closest_uv(ab1, ac1, ad1)
    if quirk:
        u = jnp.where(degenerate, u, 0.0)
        v = jnp.where(degenerate, v, 0.0)

    q0 = u[..., None] * ab1
    q1 = ac1 + v[..., None] * (ad1 - ac1)
    dist = jnp.linalg.norm(q0 - q1, axis=-1)
    proximity_hit = dist < 0.5  # hard-coded (CollisionDetection.cpp:372)

    abd = ab1 - ab0
    acd = ac1 - ac0
    add = ad1 - ad0
    c3 = _det3v(abd, acd, add)
    c2 = _det3v(ab0, acd, add) + _det3v(abd, ac0, add) + _det3v(abd, acd, ad0)
    c1 = _det3v(ab0, ac0, add) + _det3v(ab0, acd, ad0) + _det3v(abd, ac0, ad0)
    c0 = _det3v(ab0, ac0, ad0)
    t, found = earliest_root_in_unit_interval(c3, c2, c1, c0)

    abt = ab0 + t[..., None] * abd
    act = ac0 + t[..., None] * acd
    adt = ad0 + t[..., None] * add
    cdt = adt - act
    nt = _safe_normalize(jnp.cross(abt, cdt))
    # Cramer's rule for [abt, -cdt, nt]·(u,v,·) = act (see
    # _barycentric_inside for why no 3x3 matrices are formed).
    det = _det3v(abt, -cdt, nt)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u = _det3v(act, -cdt, nt) * inv_det
    v = _det3v(abt, act, nt) * inv_det
    inside = (det != 0.0) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
    ccd_hit = found & inside

    hit = proximity_hit | ccd_hit
    t_out = jnp.where(proximity_hit, 1.0, jnp.where(ccd_hit, t, 0.0))
    return hit, t_out
