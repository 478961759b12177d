"""Vectorized cubic root finding for continuous collision detection.

The reference finds the earliest coplanarity time by handing the cubic to
``Eigen::PolynomialSolver`` (companion-matrix eigenvalues,
``CollisionDetection.cpp:189-205``) with exact-zero fallbacks for degenerate
degrees (``CollisionDetection.cpp:143-187``).  Companion-matrix
eigendecomposition is hostile to TPUs; this module solves the cubic in closed
form (Cardano / trigonometric method) — branch-free, fixed-shape, vectorized
over all collision candidates at once — and polishes the selected root with
two bracketed Newton steps to recover float32 accuracy (the Yuksel-style
fallback the reference also carries, ``CollisionDetection.cpp:107-141``).

Degenerate-degree handling keeps the reference's *exact* float comparisons
(``cubicCoeff == 0.0f`` etc.), including its quadratic-path quirk of giving
up when the ``(-c-√)/2b`` root lies beyond t=1 without consulting the other
root.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2π/3


def _cbrt(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _cubic_roots_closed_form(a, b, c, d):
    """All real roots of ``a·t³ + b·t² + c·t + d`` (a ≠ 0 assumed).

    Returns ``(roots f32[..., 3], real_mask bool[..., 3])``; non-real slots
    are filled with +inf.
    """
    inv_a = 1.0 / a
    p = b * inv_a
    q = c * inv_a
    r = d * inv_a
    # Depress: t = s − p/3  ⇒  s³ + A·s + B
    p2 = p * p
    A = q - p2 / 3.0
    B = (2.0 * p2 * p - 9.0 * p * q + 27.0 * r) / 27.0
    shift = -p / 3.0

    disc = (B * B) / 4.0 + (A * A * A) / 27.0

    # One-real-root branch (disc > 0), Cardano:
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s_single = _cbrt(-B / 2.0 + sq) + _cbrt(-B / 2.0 - sq)

    # Three-real-root branch (disc <= 0), trigonometric:
    m = 2.0 * jnp.sqrt(jnp.maximum(-A / 3.0, 1e-30))
    acos_arg = jnp.clip(
        3.0 * B / (A * m + jnp.where(jnp.abs(A * m) < 1e-30, 1e-30, 0.0)),
        -1.0,
        1.0,
    )
    theta = jnp.arccos(acos_arg) / 3.0
    s0 = m * jnp.cos(theta)
    s1 = m * jnp.cos(theta - _TWO_PI_3)
    s2 = m * jnp.cos(theta - 2.0 * _TWO_PI_3)

    one_real = disc > 0
    inf = jnp.full_like(a, jnp.inf)
    r0 = jnp.where(one_real, s_single, s0) + shift
    r1 = jnp.where(one_real, inf, s1 + shift)
    r2 = jnp.where(one_real, inf, s2 + shift)
    roots = jnp.stack([r0, r1, r2], axis=-1)
    real = jnp.stack(
        [jnp.ones_like(one_real), ~one_real, ~one_real], axis=-1
    )
    return roots, real


def _newton_polish(a, b, c, d, t, steps: int = 2):
    """Bracketed Newton polish clamped to [0, 1]
    (cf. ``fastFindRootInInterval``, ``CollisionDetection.cpp:107-141``)."""
    for _ in range(steps):
        f = ((a * t + b) * t + c) * t + d
        fp = (3.0 * a * t + 2.0 * b) * t + c
        t_new = t - f / jnp.where(jnp.abs(fp) < 1e-20, 1e-20, fp)
        t = jnp.clip(jnp.where(jnp.isfinite(t_new), t_new, t), 0.0, 1.0)
    return t


def earliest_root_in_unit_interval(a, b, c, d):
    """Earliest root of ``a·t³ + b·t² + c·t + d`` in ``[0, 1]``.

    Vectorized transcription of ``findRootInInterval``
    (``CollisionDetection.cpp:143-205``).  Returns ``(t, found)``; ``t`` is 0
    where nothing was found.
    """
    # --- cubic path ---
    roots, real = _cubic_roots_closed_form(
        jnp.where(a == 0.0, jnp.ones_like(a), a), b, c, d
    )
    in01 = real & (roots >= 0.0) & (roots <= 1.0)
    masked = jnp.where(in01, roots, jnp.inf)
    t_cubic = jnp.min(masked, axis=-1)
    found_cubic = jnp.isfinite(t_cubic)
    t_cubic = jnp.where(found_cubic, t_cubic, 0.0)
    t_cubic = jnp.where(
        found_cubic, _newton_polish(a, b, c, d, t_cubic), 0.0
    )

    # --- quadratic path (a == 0, b != 0), reference quirks included ---
    disc = c * c - 4.0 * b * d
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_q1 = (-c - sq) / jnp.where(b == 0.0, 1.0, 2.0 * b)
    t_q2 = (-c + sq) / jnp.where(b == 0.0, 1.0, 2.0 * b)
    # Reference: if first root > 1 → give up; if < 0 → try second root.
    t_quad = jnp.where(t_q1 < 0.0, t_q2, t_q1)
    found_quad = (
        (disc >= 0.0) & (t_q1 <= 1.0) & (t_quad >= 0.0) & (t_quad <= 1.0)
    )
    t_quad = jnp.where(found_quad, t_quad, 0.0)

    # --- linear path (a == b == 0, c != 0) ---
    t_lin = -d / jnp.where(c == 0.0, 1.0, c)
    found_lin = (t_lin >= 0.0) & (t_lin <= 1.0)
    t_lin = jnp.where(found_lin, t_lin, 0.0)

    # --- constant path: root ⇔ d == 0 at t = 0 ---
    found_const = d == 0.0

    is_cubic = a != 0.0
    is_quad = (~is_cubic) & (b != 0.0)
    is_lin = (~is_cubic) & (~is_quad) & (c != 0.0)

    t = jnp.where(
        is_cubic,
        t_cubic,
        jnp.where(is_quad, t_quad, jnp.where(is_lin, t_lin, 0.0)),
    )
    found = jnp.where(
        is_cubic,
        found_cubic,
        jnp.where(is_quad, found_quad, jnp.where(is_lin, found_lin, found_const)),
    )
    return t, found
