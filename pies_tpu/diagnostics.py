"""Observability: constraint residuals, step metrics, profiler hooks.

The reference has no tracing, metrics, or logging of any kind (SURVEY §5 —
the only host-visible state is ``renderStateDirty``).  This module provides
the rebuild's observability layer:

* :func:`constraint_residuals` — per-constraint-type violation norms,
  compiled on device (cheap: one extra projection pass), the quantitative
  "is the solver converging" signal the reference never had;
* :func:`solver_stats` — a host-side snapshot combining residuals with the
  tick timing counters kept by ``Solver``;
* :func:`trace` — a ``jax.profiler`` context manager for capturing device
  traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from .ops import math3d
from .state import SolverState
from .topology import Topology


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@jax.jit
def constraint_residuals(state: SolverState, topo: Topology) -> dict:
    """Mean violation per constraint type at the current positions.

    Definitions (all 0 when satisfied):

    * ``distance``: |current length − rest length|
    * ``position``: |node − pinned target|
    * ``strain``: distance of F's singular values from [minStrain, maxStrain]
    * ``volume``: distance of det F from [minOmega, maxOmega]
    * ``bend``: |dihedral angle − rest angle|
    * ``floor``: penetration depth below the floor plane (y=0 quirk plane)
    """
    x = state.positions

    d = topo.distance
    length = jnp.linalg.norm(x[d.idx[:, 1]] - x[d.idx[:, 0]], axis=-1)
    distance_res = _masked_mean(jnp.abs(length - d.rest), (d.w > 0))

    p = topo.position
    position_res = _masked_mean(
        jnp.linalg.norm(x[p.idx] - p.target, axis=-1), (p.w > 0)
    )

    def tet_f(batch):
        pos = x[batch.idx]
        edges = jnp.stack(
            [pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0], pos[:, 3] - pos[:, 0]],
            axis=-1,
        )
        return jnp.einsum(
            "cij,cjk->cik", edges, batch.qinv3(),
            precision=jax.lax.Precision.HIGHEST,
        )

    s = topo.strain
    f = tet_f(s)
    _, sigma, _ = math3d.svd3x3(f)
    viol = jnp.maximum(s.lo[:, None] - sigma, 0.0) + jnp.maximum(
        sigma - s.hi[:, None], 0.0
    )
    strain_res = _masked_mean(jnp.max(viol, axis=-1), (s.w > 0))

    v = topo.volume
    det = math3d.det3x3(tet_f(v))
    vol_viol = jnp.maximum(v.lo - det, 0.0) + jnp.maximum(det - v.hi, 0.0)
    volume_res = _masked_mean(vol_viol, (v.w > 0))

    b = topo.bend
    pb = x[b.idx]
    p2, p3, p4 = pb[:, 1] - pb[:, 0], pb[:, 2] - pb[:, 0], pb[:, 3] - pb[:, 0]
    n1 = jnp.cross(p2, p3)
    n2 = jnp.cross(p2, p4)
    n1 = n1 / jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), 1e-20)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-20)
    angle = jnp.arccos(jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0))
    bend_res = _masked_mean(jnp.abs(angle - b.rest_angle), (b.w > 0))

    floor_pen = _masked_mean(jnp.maximum(-x[:, 1], 0.0), state.node_mask)

    return {
        "distance": distance_res,
        "position": position_res,
        "strain": strain_res,
        "volume": volume_res,
        "bend": bend_res,
        "floor_penetration": floor_pen,
        "max_speed": jnp.max(
            jnp.linalg.norm(state.velocities, axis=-1) * state.node_mask
        ),
    }


def solver_stats(solver) -> dict:
    """Host-side metrics snapshot for a ``Solver`` instance."""
    solver._prepare()
    residuals = {
        k: float(v)
        for k, v in constraint_residuals(solver.state, solver.topology).items()
    }
    return {
        "ticks": solver.ticks,
        "last_tick_seconds": solver.last_tick_seconds,
        "steps_per_sec": (
            1.0 / solver.last_tick_seconds if solver.last_tick_seconds else 0.0
        ),
        "cg_residual": solver.last_residual,
        "sim_failed": solver.sim_failed,
        **residuals,
    }


def broadphase_health(solver) -> dict:
    """Coverage diagnostics for the cell-list broadphase at the current
    state: how many items (triangles, or bodies on the packed path) span
    more than one grid cell (still found symmetrically, via two-corner
    insertion) and how many exceed two cells (these latch ``sim_failed``).
    The reference silently skips such items (``Solver.cpp:672-674``); here
    the counts are observable on demand.
    """
    solver._prepare()
    from .collision.broadphase import _tri_swept_aabb

    state = solver.state
    topo = solver.topology
    params = solver.current_params()
    cfg = solver._config
    cell = params.broadphase_cell

    @jax.jit
    def counts(x, prev, tris, tri_mask):
        lo, hi = _tri_swept_aabb(x, prev, tris, cell)
        live = tri_mask > 0
        if cfg.budget.body_stride > 1:
            e = cfg.budget.body_stride
            k = tris.shape[0] // e
            big = jnp.asarray(3.0e38, x.dtype)
            lo = jnp.min(
                jnp.where(live[:, None], lo, big).reshape(k, e, 3), axis=1
            )
            hi = jnp.max(
                jnp.where(live[:, None], hi, -big).reshape(k, e, 3), axis=1
            )
            live = jnp.any(live.reshape(k, e), axis=1)
        ext = jnp.max(hi - lo, axis=-1)
        margin = params.collision_threshold_distance / cell
        oversize = jnp.sum(((ext > 1.0) & live).astype(jnp.int32))
        latching = jnp.sum(((ext > 2.0 - margin) & live).astype(jnp.int32))
        return oversize, latching

    oversize, latching = counts(
        state.positions, state.prev_positions, topo.triangles, topo.tri_mask
    )
    out = {
        "broadphase_oversize_items": int(oversize),
        "broadphase_latching_items": int(latching),
    }

    # Buffer occupancy vs the static budgets: candidate buffers and the
    # contact buffer drop overflow gracefully, so without these ratios a
    # scene drifts toward the budget cliff invisibly (VERDICT round-2 #8).
    if topo.triangles.shape[0] and cfg.enable_collisions:
        from functools import partial

        from .collision.broadphase import candidate_occupancy
        from .solver.step import default_detect_collisions

        cmax, cmean, cap_c = jax.jit(
            partial(candidate_occupancy, params=params, config=cfg)
        )(
            state.positions,
            state.prev_positions,
            topo.triangles,
            topo.tri_mask,
        )
        colls = jax.jit(partial(default_detect_collisions, config=cfg))(
            state, state.positions, topo, params
        )
        live_pt = int(jnp.sum(colls.pt_mask))
        cap_pt = int(colls.pt_idx.shape[0])
        out.update(
            {
                "candidate_count_max": int(cmax),
                "candidate_count_mean": float(cmean),
                "candidate_budget": int(cap_c),
                "candidate_occupancy": float(cmax) / max(cap_c, 1),
                "pt_contacts_live": live_pt,
                "pt_contact_cap": cap_pt,
                "pt_contact_occupancy": live_pt / max(cap_pt, 1),
            }
        )
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile: ``with diagnostics.trace("/tmp/prof"): ...``"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
