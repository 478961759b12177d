"""Top-level jitted tick: dispatch + substep loop.

``tick`` is the compiled analog of ``Solver::tick`` (``Solver.cpp:25-38``):
a no-op once the sim-failed latch is set, otherwise ``time_substeps``
substeps of the configured solver, all inside one XLA program.  Both tick
variants ignore the wall-clock ``deltaTime`` and use the fixed timestep,
exactly like the reference (``Solver.cpp:40-42,165``).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp

from ..collision.batches import detect_floor_contacts, empty_collision_set
from ..options import PhysicsParams, SolverName, StepConfig
from ..state import SolverState
from ..topology import Topology
from .pbd import pbd_substep
from .pd import pd_substep


def default_detect_collisions(state, x, topo, params, config: StepConfig):
    """PD collision detection for one substep.

    Always emits floor contacts from triangle corners (``Solver.cpp:829-834``).
    Point-triangle CCD runs through the sorted-grid broadphase when
    ``config.enable_collisions`` and the scene has triangles; see
    ``collision/broadphase.py``.
    """
    if config.dense_floor:
        from ..collision.batches import detect_floor_active

        floor_active = detect_floor_active(
            x,
            topo.floor_count,
            params.floor_height,
            params.collision_thickness,
        )
        colls = empty_collision_set(pt_cap=0, static_cap=0)
        colls = replace(colls, floor_active=floor_active)
    else:
        static_idx, static_mask = detect_floor_contacts(
            x,
            topo.triangles,
            topo.tri_mask,
            params.floor_height,
            params.collision_thickness,
        )
        colls = empty_collision_set(pt_cap=0, static_cap=static_idx.shape[0])
        colls = replace(colls, static_idx=static_idx, static_mask=static_mask)
    if config.enable_collisions and topo.triangles.shape[0] > 0:
        from ..collision.broadphase import detect_point_tri_collisions

        bp = getattr(state, "bp", None)
        if bp is not None:
            pt_idx, pt_mask, overflow, new_bp = detect_point_tri_collisions(
                x, state.prev_positions, topo.triangles, topo.tri_mask,
                params, config, cache=bp,
                corners=topo.super_corners, adj=topo.super_adj,
            )
            colls = replace(colls, bp=new_bp)
        else:
            pt_idx, pt_mask, overflow = detect_point_tri_collisions(
                x, state.prev_positions, topo.triangles, topo.tri_mask,
                params, config,
                corners=topo.super_corners, adj=topo.super_adj,
            )
        colls = replace(
            colls, pt_idx=pt_idx, pt_mask=pt_mask, overflow=overflow
        )
    if config.enable_edge_collisions and topo.triangles.shape[0] > 0:
        from ..collision.broadphase import detect_edge_edge_collisions

        edge_idx, edge_mask, e_overflow = detect_edge_edge_collisions(
            x, state.prev_positions, topo.triangles, topo.tri_mask, params, config
        )
        colls = replace(
            colls,
            edge_idx=edge_idx,
            edge_mask=edge_mask,
            overflow=jnp.logical_or(colls.overflow, e_overflow),
        )
    if config.enable_node_collisions:
        from ..collision.broadphase import detect_node_node_pairs

        nn_idx, nn_mask = detect_node_node_pairs(state, x, params, config)
        colls = replace(colls, nn_idx=nn_idx, nn_mask=nn_mask)
    return colls


def default_detect_node_pairs(state, x, vel, params, config: StepConfig, cache):
    """PBD node-node collision response (``Solver.cpp:81-130``)."""
    if not config.enable_collisions:
        return x, vel, jnp.asarray(False), cache
    from ..collision.broadphase import pbd_node_node_response

    out = pbd_node_node_response(state, x, vel, params, config, cache)
    return out if cache is not None else out + (None,)


@partial(jax.jit, static_argnames=("config",))
def tick(
    state: SolverState,
    topo: Topology,
    params: PhysicsParams,
    config: StepConfig,
) -> tuple[SolverState, jax.Array]:
    """One solver tick (= ``time_substeps`` substeps); returns
    ``(state, last_global_residual)``."""

    def run(state):
        if config.solver == SolverName.PD:
            # Gravity forces, set once per tick (Solver.cpp:224-226):
            # force = (0, −g, 0)·mass.
            forces = (
                jnp.zeros_like(state.positions)
                .at[:, 1]
                .set(-params.gravity * state.mass * state.node_mask)
            )
            state = replace(state, forces=forces)

            def sub(carry, _):
                s, _ = carry
                s, res = pd_substep(
                    s, topo, params, config, default_detect_collisions
                )
                return (s, res), None

            (state, res), _ = jax.lax.scan(
                sub,
                (state, jnp.asarray(0.0, state.positions.dtype)),
                None,
                length=config.time_substeps,
            )
            return state, res
        else:

            def sub(carry, _):
                s, _ = carry
                s, res = pbd_substep(
                    s, topo, params, config, default_detect_node_pairs
                )
                return (s, res), None

            (state, res), _ = jax.lax.scan(
                sub,
                (state, jnp.asarray(0.0, state.positions.dtype)),
                None,
                length=config.time_substeps,
            )
            return state, res

    def skip(state):
        return state, jnp.asarray(0.0, state.positions.dtype)

    # _simFailed gate (Solver.cpp:26-28).
    return jax.lax.cond(state.sim_failed, skip, run, state)


@partial(jax.jit, static_argnames=("config", "n"))
def tick_n(
    state: SolverState,
    topo: Topology,
    params: PhysicsParams,
    config: StepConfig,
    n: int,
) -> tuple[SolverState, jax.Array]:
    """``n`` ticks in ONE compiled dispatch; returns the last residual.

    Per-dispatch overhead through a remote-TPU tunnel is tens of
    milliseconds times the argument leaf count, so production stepping
    should batch ticks (``Solver.run_ticks``); semantics are identical to
    ``n`` calls of :func:`tick` (the sim-failed gate applies per tick).
    """

    def body(s, _):
        s2, res = tick(s, topo, params, config)
        return s2, res

    state, residuals = jax.lax.scan(body, state, None, length=n)
    return state, residuals[-1]
