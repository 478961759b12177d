"""Pure-NumPy oracle: a slow, faithful CPU transcription of the reference's
per-constraint math and solver loops.

Serves two roles (SURVEY §4, §6):

* **fidelity oracle** — every batched TPU kernel is checked against these
  scalar formulas, which transcribe the cited reference code paths exactly
  (float32, same guards, same quirks);
* **CPU baseline** — the reference's C++ cannot be built here (its Extern/
  submodules are empty), so BASELINE.md measures this transcription's
  vectorized variant instead (see scripts/measure_cpu_baseline.py).

Each function cites the reference lines it transcribes.
"""

from __future__ import annotations

import numpy as np

F = np.float32


# ---------------------------------------------------------------------------
# Constraint projections
# ---------------------------------------------------------------------------


def distance_project(pa, pb, rest):
    """``DistanceConstraintProjection`` (Constraints.cpp:11-37)."""
    pa, pb = pa.astype(F), pb.astype(F)
    diff = pb - pa
    dist = F(np.linalg.norm(diff))
    d = np.array([1.0, 0.0, 0.0], F)
    if dist > 1e-5:
        d = diff / dist
    disp = F(rest) - dist
    return np.stack([pa - disp * d, pb])


def position_project(target):
    """``PositionConstraintProjection`` (Constraints.cpp:58-63)."""
    return np.asarray(target, F).copy()


def _fix_f(p4, qinv, fix_sigma):
    """Shared strain/volume scaffolding (Constraints.cpp:85-127,214-254):
    deformation gradient, SVD, singular-value fix, reconstruction."""
    p4 = p4.astype(F)
    edges = np.stack([p4[1] - p4[0], p4[2] - p4[0], p4[3] - p4[0]], axis=-1)
    f = edges @ qinv.astype(F)
    u, s, vt = np.linalg.svd(f.astype(np.float64))
    s_hat = fix_sigma(s, np.linalg.det(f.astype(np.float64)))
    fhat = (u * s_hat) @ vt
    zero = np.zeros(3, F)
    return np.stack([zero, fhat[:, 0], fhat[:, 1], fhat[:, 2]]).astype(F)


def tet_strain_project(p4, qinv, min_strain, max_strain):
    """``TetrahedralConstraintProjection`` (Constraints.cpp:76-128)."""

    def fix(s, det):
        s = np.clip(s, min_strain, max_strain)
        if det < 0:
            s = s.copy()
            s[2] *= -1.0
        return s

    return _fix_f(p4, qinv, fix)


def compute_d(sigma, omega_min, omega_max):
    """``computeD`` (Constraints.cpp:186-203), 10 fixed iterations."""
    d = np.zeros(3)
    for _ in range(10):
        spd = sigma + d
        product = spd[0] * spd[1] * spd[2]
        omega = np.clip(product, omega_min, omega_max)
        c = product - omega
        grad = np.array([spd[1] * spd[2], spd[0] * spd[2], spd[0] * spd[1]])
        gg = grad @ grad
        d = (grad @ d - c) * grad / (gg if gg != 0 else 1e-30)
    return d


def tet_volume_project(p4, qinv, min_omega, max_omega):
    """``VolumeConstraintProjection`` (Constraints.cpp:205-255)."""

    def fix(s, det):
        return s + compute_d(s, min_omega, max_omega)

    return _fix_f(p4, qinv, fix)


def bend_project(p4, inv_mass4, rest_angle):
    """``BendConstraintProjection`` (Constraints.cpp:312-366)."""
    p4 = p4.astype(F)
    x1, x2, x3, x4 = p4
    p2, p3, pp4 = x2 - x1, x3 - x1, x4 - x1
    c23, c24 = np.cross(p2, p3), np.cross(p2, pp4)
    l23, l24 = np.linalg.norm(c23), np.linalg.norm(c24)
    n1, n2 = c23 / l23, c24 / l24
    d = float(np.clip(n1 @ n2, -1.0, 1.0))
    c = np.arccos(d) - rest_angle
    q3 = (np.cross(p2, n2) + np.cross(n1, p2) * d) / l23
    q4 = (np.cross(p2, n1) + np.cross(n2, p2) * d) / l24
    q2 = (
        -(np.cross(p3, n2) + np.cross(n1, p3) * d) / l23
        - (np.cross(pp4, n1) + np.cross(n2, pp4) * d) / l24
    )
    q1 = -q2 - q3 - q4
    q = np.stack([q1, q2, q3, q4])
    w_sum = float(np.sum(inv_mass4))
    q_sq = float(np.sum(q * q))
    num = np.sqrt(max(1.0 - d * d, 0.0)) * c
    out = p4.copy()
    if q_sq < 1e-5:
        return out
    for i in range(4):
        out[i] += -q[i] * (4 * inv_mass4[i] / w_sum) * num / q_sq
    return out


def extract_rotation(a, q, max_iter=100):
    """Müller rotation extraction (ShapeMatchingConstraint.cpp:75-94),
    float64, with the reference's early break and its `1/|den| + eps`
    parenthesization quirk.  Quaternion is (w, x, y, z)."""
    a = a.astype(np.float64)
    q = np.asarray(q, np.float64).copy()
    for _ in range(max_iter):
        r = quat_to_mat(q)
        num = sum(np.cross(r[:, i], a[:, i]) for i in range(3))
        den = sum(r[:, i] @ a[:, i] for i in range(3))
        omega = num * (1.0 / abs(den) + 1e-9)
        w = np.linalg.norm(omega)
        if w < 1e-9:
            break
        q = quat_mul(quat_from_axis_angle(w, omega / w), q)
        q /= np.linalg.norm(q)
    return q


def quat_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_from_axis_angle(angle, axis):
    half = 0.5 * angle
    return np.concatenate([[np.cos(half)], np.sin(half) * np.asarray(axis)])


def shape_matching_project(positions, indices, mat_coords_centered, inv_mass, q):
    """``ShapeMatchingConstraint::projectToAuxiliaryVariable``
    (ShapeMatchingConstraint.cpp:96-122).  ``mat_coords_centered`` are the
    COM-centered material coords; returns (projected [n,3], new quat)."""
    pts = positions[indices].astype(F)
    com = pts.mean(axis=0)  # equal weights (ShapeMatchingConstraint.cpp:98-102)
    p = np.zeros((3, 3))
    for i, idx in enumerate(indices):
        local = (pts[i] - com).astype(np.float64)
        p += np.outer(local, mat_coords_centered[i]) / inv_mass[idx]
    q_mat = np.einsum(
        "ij,jk->ik",
        p,
        np.linalg.inv(
            np.einsum(
                "mi,mj,m->ij",
                mat_coords_centered.astype(np.float64),
                mat_coords_centered.astype(np.float64),
                1.0 / inv_mass[indices],
            )
        ),
    )
    q_new = extract_rotation(q_mat, q)
    r = quat_to_mat(q_new)
    projected = (r @ mat_coords_centered.T).T + com
    return projected.astype(F), q_new


def goal_project(mat_coords, transform):
    """``GoalMatchingConstraint::projectToAuxiliaryVariable``
    (ShapeMatchingConstraint.cpp:162-173)."""
    h = np.concatenate([mat_coords, np.ones((len(mat_coords), 1))], axis=1)
    return (transform.astype(F) @ h.T).T[:, :3].astype(F)


# ---------------------------------------------------------------------------
# Collision constraint projections
# ---------------------------------------------------------------------------


def point_tri_project(p4, thickness):
    """``PointTriangleCollisionConstraint::projectToAuxiliaryVariable``
    (CollisionConstraint.cpp:86-124)."""
    p4 = p4.astype(F)
    a, b, c, d = p4
    n = np.cross(c - b, d - b)
    n = n / np.linalg.norm(n)
    n_dot_p = n @ (a - b)
    out = p4.copy()
    if n_dot_p < thickness:
        out[0] = a + (thickness - n_dot_p) * n
    return out


def edge_closest_uv(pa, pb, pc, pd, quirk=True):
    """Closest-point (u, v) of segments (a,b) and (c,d)
    (CollisionConstraint.cpp:241-289).  ``quirk=True`` transcribes the
    shadowing bug: the non-degenerate branch declares fresh locals, so the
    outer u = v = 0 survive (CollisionConstraint.cpp:253-256)."""
    ab, ac = pb - pa, pc - pa
    cd = pd - pc
    ab_sq, cd_sq, ab_cd = ab @ ab, cd @ cd, ab @ cd
    ac_ab, ac_cd = ac @ ab, ac @ cd
    det = ab_sq * -cd_sq + ab_cd * ab_cd
    u = v = 0.0
    if det != 0.0:
        if not quirk:
            u = (ac_ab * -cd_sq + ab_cd * ac_cd) / det
            v = (ab_sq * ac_cd - ac_ab * ab_cd) / det
    else:
        u0, u1 = pa @ ab, pb @ ab
        v0, v1 = pc @ ab, pd @ ab
        flip0 = u0 > u1
        if flip0:
            u0, u1 = u1, u0
        flip1 = v0 > v1
        if flip1:
            v0, v1 = v1, v0
        if u0 >= v1:
            u, v = (1.0 if flip0 else 0.0), (0.0 if flip1 else 1.0)
        elif v0 >= u1:
            u, v = (0.0 if flip0 else 1.0), (1.0 if flip1 else 0.0)
        else:
            mid = (u0 + v1) * 0.5 if u0 > v0 else (v0 + u1) * 0.5
            u = 0.5 if u0 == u1 else (mid - u0) / (u1 - u0)
            v = 0.5 if v0 == v1 else (mid - v0) / (v1 - v0)
    return float(np.clip(u, 0.0, 1.0)), float(np.clip(v, 0.0, 1.0))


def edge_project(p4, inv_mass4, thickness, quirk=True):
    """``EdgeCollisionConstraint::projectToAuxiliaryVariable``
    (CollisionConstraint.cpp:225-314).  ``quirk=True`` is reference-literal,
    including its attracting sign (disp = −(th−dist)·n with a,b += / c,d −=,
    the opposite of the constraint's own stabilization pass — dead code in
    the reference); ``quirk=False`` is the intended separating form."""
    p4 = np.asarray(p4, F)
    pa, pb, pc, pd = p4
    u, v = edge_closest_uv(pa, pb, pc, pd, quirk)
    ab, ac, ad = pb - pa, pc - pa, pd - pa
    q0 = u * ab
    q1 = ac + v * (ad - ac)
    n = q0 - q1
    dist = float(np.linalg.norm(n))
    out = p4.copy()
    if dist >= thickness:
        return out
    n = n / dist
    disp = (thickness - dist) * n
    if quirk:
        disp = -disp
    im = inv_mass4
    s = (
        im[0] * (1 - u) ** 2 + im[1] * u * u
        + im[2] * (1 - v) ** 2 + im[3] * v * v
    )
    if s == 0.0:
        return out
    out[0] += disp * im[0] * (1 - u) / s
    out[1] += disp * im[1] * u / s
    out[2] -= disp * im[2] * (1 - v) / s
    out[3] -= disp * im[3] * v / s
    return out


def static_project(p, floor_quirk=True, floor_height=0.0):
    """``StaticCollisionConstraint::projectToAuxiliaryVariable``
    (CollisionConstraint.cpp:447-455) — clamps to y=0 regardless of
    floorHeight in quirk (reference) mode."""
    plane = 0.0 if floor_quirk else floor_height
    out = np.asarray(p, F).copy()
    if out[1] < plane:
        out[1] = plane
    return out


# ---------------------------------------------------------------------------
# CCD
# ---------------------------------------------------------------------------


def point_triangle_ccd(ap0, ab0, ac0, ap1, ab1, ac1, threshold):
    """``pointTriangleCCD`` (CollisionDetection.cpp:227-302) with the
    companion-matrix root finder replaced by ``np.roots`` (identical
    semantics: all real roots in [0,1], earliest wins)."""

    def norm(v):
        return v / np.linalg.norm(v)

    n0, n1 = norm(np.cross(ab0, ac0)), norm(np.cross(ab1, ac1))
    ndp0, ndp1 = n0 @ ap0, n1 @ ap1
    if ndp0 * ndp1 >= 0.0:
        if 0.0 <= ndp1 < threshold:
            bary = np.linalg.inv(np.stack([ab1, ac1, n1], axis=-1)) @ ap1
            if (
                0 <= bary[0] <= 1
                and 0 <= bary[1] <= 1
                and bary[0] + bary[1] <= 1
            ):
                return 0.0
        return None

    apd, abd, acd = ap1 - ap0, ab1 - ab0, ac1 - ac0

    def det(a, b, c):
        return float(a @ np.cross(b, c))

    c3 = det(apd, abd, acd)
    c2 = det(ap0, abd, acd) + det(apd, ab0, acd) + det(apd, abd, ac0)
    c1 = det(ap0, ab0, acd) + det(ap0, abd, ac0) + det(apd, ab0, ac0)
    c0 = det(ap0, ab0, ac0)

    roots = np.roots([c3, c2, c1, c0]) if c3 != 0 else np.roots([c2, c1, c0])
    valid = [
        r.real
        for r in np.atleast_1d(roots)
        if abs(r.imag) < 1e-7 and 0.0 <= r.real <= 1.0
    ]
    if not valid:
        return None
    t = min(valid)
    apt, abt, act = ap0 + t * apd, ab0 + t * abd, ac0 + t * acd
    nt = norm(np.cross(abt, act))
    bary = np.linalg.inv(np.stack([abt, act, nt], axis=-1)) @ apt
    if 0 <= bary[0] <= 1 and 0 <= bary[1] <= 1 and bary[0] + bary[1] <= 1:
        return t
    return None


# ---------------------------------------------------------------------------
# Dense PD global system (oracle for the matrix-free PCG)
# ---------------------------------------------------------------------------


def dense_pd_matrix(n, mass, h, contributions):
    """Assemble the N x N system (Solver.cpp:174-215): diag(m/h²) plus
    ``w·AᵀA`` blocks.  ``contributions`` is a list of (node_ids, w, AtA)."""
    m = np.zeros((n, n))
    for i in range(n):
        m[i, i] = mass[i] / (h * h)
    for ids, w, ata in contributions:
        for a, ia in enumerate(ids):
            for b, ib in enumerate(ids):
                m[ia, ib] += w * ata[a, b]
    return m
