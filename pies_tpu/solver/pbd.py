"""Position-Based-Dynamics solver — one fused XLA program per tick.

Transcribes ``Solver::tickPBD`` (``Solver.cpp:40-160``): explicit advection,
``iterations x`` of direct constraint projection + node-node collision
response + floor clamp, then the damped velocity update with floor friction.

The reference projects constraints *sequentially in place* (Gauss-Seidel,
``Constraints.h:121-129``).  Batched TPU projection is Jacobi within each
constraint type: every projection is computed from the same positions, the
weighted deltas are accumulated with a deterministic scatter-add, and the sum
is averaged by the number of active constraints per node (the standard
parallel-PBD stabilization).  Types are still applied in the reference's
order — position, distance, tet, bend — so cross-type sequencing matches.
The divergence from sequential projection is documented in FIDELITY.md; the
PD path (the reference's default) has no such divergence since its local step
is already Jacobi.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..constraints import projections as proj
from ..options import PhysicsParams, StepConfig
from ..state import SolverState
from ..topology import Topology


def _apply_jacobi(
    x: jax.Array,
    idx: jax.Array,  # [C] or [C, k]
    projected: jax.Array,  # [C, 3] or [C, k, 3]
    w: jax.Array,  # [C]
    active: jax.Array | None = None,  # bool[C, k] slots that can move
) -> jax.Array:
    """Accumulate ``w·(projected − x)`` per node and apply the count-averaged
    sum — the batched analog of ``projectNodePositions``
    (``Constraints.h:121-129``)."""
    if idx.ndim == 1:
        idx = idx[:, None]
        projected = projected[:, None, :]
    delta = w[:, None, None] * (projected - x[idx])
    live = (w > 0)[:, None] & (
        active if active is not None else jnp.ones(idx.shape, bool)
    )
    delta = jnp.where(live[..., None], delta, 0.0)

    acc = jnp.zeros_like(x).at[idx].add(delta)
    cnt = jnp.zeros(x.shape[0], dtype=x.dtype).at[idx].add(live.astype(x.dtype))
    return x + acc / jnp.maximum(cnt, 1.0)[:, None]


def pbd_substep(
    state: SolverState,
    topo: Topology,
    params: PhysicsParams,
    config: StepConfig,
    detect_node_pairs,
) -> tuple[SolverState, jax.Array]:
    """One PBD substep.

    ``detect_node_pairs(state, x, vel, params, config, cache)`` implements
    the inline node-node collision response + friction of
    ``Solver.cpp:81-130`` over the sorted-grid broadphase and returns
    ``(x, vel, overflow, cache)`` (``cache`` is the temporal node-pair
    cache carried in ``state.nn``, or None).
    """
    dt = params.dt
    mask = state.node_mask[:, None]

    # Advect (Solver.cpp:47-52): prev = pos; pos += v·dt − g·dt²·ŷ.
    prev = state.positions
    gravity = jnp.zeros_like(state.positions).at[:, 1].set(-params.gravity)
    x = state.positions + (state.velocities * dt + gravity * dt * dt) * mask

    def iteration(_, carry):
        x, vel, overflow, nn = carry

        # Position constraints, gated by releaseHinge (Solver.cpp:59-63).
        p = topo.position
        w_pos = p.w * (1.0 - params.release_hinge)
        x = _apply_jacobi(x, p.idx, proj.project_position(p), w_pos)

        # Distance (Solver.cpp:65-67): only node 0 moves under the
        # asymmetric projection (Constraints.cpp:34); node 1's delta is
        # identically zero, so it is excluded from the averaging count.
        d = topo.distance
        if config.distance_chain and topo.chains is not None:
            # EXACT sequential projection for chain scenes (ropes): the
            # constraints partition into node-disjoint chase chains
            # (topology.ChainBatch), so a lax.scan down the link axis with
            # the carry holding the just-updated chase target reproduces
            # the reference's in-emission-order projection bit-for-bit —
            # tension traverses a whole rope in ONE iteration
            # (Constraints.h:121-129 applied at Solver.cpp:65-67).  Every
            # written node is globally unique, so reading its own position
            # from the pre-iteration x is exact, and all deltas scatter
            # once after the scan (w=0 padding links add zero).
            ch = topo.chains

            def link(tgt, inputs):
                i0, rest, w = inputs  # [C] each
                pa = x[i0]
                diff = tgt - pa
                dist = jnp.linalg.norm(diff, axis=-1)
                safe = dist > 1e-5
                dir_ = jnp.where(
                    safe[:, None],
                    diff / jnp.maximum(dist, 1e-20)[:, None],
                    jnp.array([1.0, 0.0, 0.0], dtype=x.dtype),
                )
                disp = rest - dist
                # proj0 − pa = −disp·dir (Constraints.cpp:29-36)
                delta = w[:, None] * (-disp[:, None] * dir_)
                return pa + delta, delta

            _, deltas = jax.lax.scan(
                link, x[ch.anchor], (ch.idx0.T, ch.rest.T, ch.w.T)
            )  # deltas [L, C, 3]
            x = x.at[ch.idx0.T.reshape(-1)].add(deltas.reshape(-1, 3))
        elif config.distance_colors:
            # Colored Gauss-Seidel (StepConfig.distance_colors): project
            # color classes sequentially with the reference's exact
            # per-constraint update pos0 += w·(proj0 − pos0) — within a
            # class no node repeats, so no averaging and no write races;
            # each class reads positions updated by every previous class,
            # restoring the sequential projection's tension propagation
            # (Constraints.h:121-129 at Solver.cpp:65-67) that the batched
            # Jacobi form loses on long chains (FIDELITY.md #19).
            s0 = 0
            for e0 in config.distance_colors:
                i0 = d.idx[s0:e0, 0]
                i1 = d.idx[s0:e0, 1]
                pa = x[i0]
                pb = x[i1]
                diff = pb - pa
                dist = jnp.linalg.norm(diff, axis=-1)
                safe = dist > 1e-5
                dir_ = jnp.where(
                    safe[:, None],
                    diff / jnp.maximum(dist, 1e-20)[:, None],
                    jnp.array([1.0, 0.0, 0.0], dtype=x.dtype),
                )
                disp = d.rest[s0:e0] - dist
                # proj0 − pa = −disp·dir (Constraints.cpp:29-36)
                x = x.at[i0].add(
                    d.w[s0:e0, None] * (-disp[:, None] * dir_)
                )
                s0 = e0
        else:
            active = jnp.stack(
                [jnp.ones_like(d.w, bool), jnp.zeros_like(d.w, bool)],
                axis=-1,
            )
            x = _apply_jacobi(
                x, d.idx, proj.project_distance(x, d), d.w, active
            )

        # Tetrahedral strain (Solver.cpp:69-71).  Quirk mode reproduces the
        # reference faithfully: the projection lives in differential
        # coordinates with node 0 at the origin (Constraints.cpp:124), and
        # PBD blends positions straight toward it — including node 0 toward
        # the origin.  Non-quirk mode re-centers the projected tet on the
        # current centroid (the physically-intended update).
        s = topo.strain
        ps = proj.project_strain(x, s, config.strain_contiguous)
        if not config.reference_quirks:
            center = jnp.mean(x[s.idx], axis=1, keepdims=True)
            ps = ps - jnp.mean(ps, axis=1, keepdims=True) + center
        x = _apply_jacobi(x, s.idx, ps, s.w)

        # Bend (Solver.cpp:73-75).
        b = topo.bend
        x = _apply_jacobi(x, b.idx, proj.project_bend(x, state.inv_mass, b), b.w)

        # Node-node collision response + friction impulses over the
        # sorted-grid broadphase (Solver.cpp:81-130).  Velocity impulses
        # persist across iterations (the reference mutates node.velocity);
        # they are discarded at substep end when velocity is recomputed from
        # positions, exactly like the reference.
        x, vel, of, nn = detect_node_pairs(state, x, vel, params, config, nn)
        overflow = jnp.logical_or(overflow, of)

        # Floor clamp (Solver.cpp:132-136).
        lift = params.floor_height + state.radius - x[:, 1]
        live = state.node_mask > 0
        x = x.at[:, 1].add(jnp.where((lift > 0) & live, lift, 0.0))
        return x, vel, overflow, nn

    x, _, overflow, nn = jax.lax.fori_loop(
        0,
        config.iterations,
        iteration,
        (x, state.velocities, jnp.asarray(False), state.nn),
    )

    # Velocity update (Solver.cpp:139-158): damped finite difference, then
    # floor friction with the reference's hard-coded 5.0 stop speed.
    new_vel = (1.0 - params.damping) * (x - prev) / dt * mask
    on_floor = (x[:, 1] - state.radius <= params.floor_height) & (mask[:, 0] > 0)
    xz_speed = jnp.sqrt(new_vel[:, 0] ** 2 + new_vel[:, 2] ** 2)
    stop = on_floor & (xz_speed < 5.0)
    scale = jnp.where(stop, 0.0, jnp.where(on_floor, 1.0 - params.friction, 1.0))
    new_vel = new_vel.at[:, 0].multiply(scale).at[:, 2].multiply(scale)

    failed = jnp.logical_or(overflow, ~jnp.all(jnp.isfinite(x)))
    new_state = replace(
        state,
        positions=x,
        prev_positions=x,
        velocities=new_vel,
        sim_failed=jnp.logical_or(state.sim_failed, failed),
        nn=nn,
    )
    return new_state, jnp.asarray(0.0, x.dtype)
