"""Projective-Dynamics solver — one fused XLA program per tick.

Transcribes the *semantics* of ``Solver::tickPD`` (``Solver.cpp:162-486``)
into a TPU-native structure:

* the lazy sparse-matrix build + ``SimplicialLLT`` prefactorization
  (``Solver.cpp:168-221``) disappears — the system is applied matrix-free and
  preconditioned by its assembled diagonal (see :mod:`assembly`);
* the per-substep collision re-factorization (``Solver.cpp:242-262``) becomes
  "feed this substep's collision batch into the operator";
* the ``iterations x`` local/global loop (``Solver.cpp:264-365``) is a
  ``fori_loop`` whose global step is Jacobi-PCG warm-started from the current
  positions;
* stabilization, velocity and friction passes (``Solver.cpp:367-484``) are
  masked vector updates with deterministic scatter-adds.

The whole tick — all substeps — runs as one compiled program with no host
round-trips.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp

from ..collision.batches import (
    CollisionSet,
    stabilize_edge_edge,
    stabilize_point_tri,
)
from ..options import PhysicsParams, StepConfig
from ..state import SolverState
from ..topology import Topology
from ..ops.precision import einsum as _einsum
from . import assembly, tetcols

# Debug flags, captured ONCE at import time.  Both are read during tracing,
# so whatever value is seen at first compile is baked into the jit cache —
# flipping the env var afterwards has no effect.
_UNROLL = bool(os.environ.get("PIES_UNROLL"))
# DEBUG ONLY: forces the prefactorized direct solve even when contacts are
# live, silently dropping every contact constraint from the global step —
# wrong physics on any contact-active scene.  Never set during benchmarks.
_FORCE_DIRECT = bool(os.environ.get("PIES_FORCE_DIRECT"))
if _FORCE_DIRECT:
    warnings.warn(
        "PIES_FORCE_DIRECT is set: the PD global step will use the"
        " contact-free prefactorized inverse even when contacts are live."
        " This drops contact constraints from the solve — debug only.",
        stacklevel=1,
    )


def pd_substep(
    state: SolverState,
    topo: Topology,
    params: PhysicsParams,
    config: StepConfig,
    detect_collisions,
) -> tuple[SolverState, jax.Array]:
    """One PD substep. Returns ``(state, cg_residual)``."""
    h = params.dt
    h2 = h * h
    mask = state.node_mask[:, None]

    # Inertia estimate: sₙ = q + h·v; Msₙ/h² (Solver.cpp:229-238).
    x = state.positions + h * state.velocities * mask
    msn_h2 = x * (state.mass / h2)[:, None]
    prev = state.prev_positions

    # Collision detection for this substep (Solver.cpp:240).
    colls: CollisionSet = detect_collisions(state, x, topo, params, config)

    mass_over_h2 = state.mass / h2
    diag = assembly.system_diag(mass_over_h2, topo, colls)
    static_diag = assembly.static_collision_diag(
        colls, state.capacity, x.dtype, topo.floor_count
    )
    if colls.nn_idx.shape[0]:
        # Node-node contacts are diagonal-only in the reference's collision
        # matrix (CollisionConstraint.cpp:41-46) — dense fold, no operator cost.
        static_diag = static_diag + assembly.node_node_diag(
            colls, state.capacity, x.dtype
        )
    pt_diag = None
    if config.contact_coupling in ("diagonal", "recentered"):
        pt_diag = assembly.point_tri_collision_diag(
            colls, state.capacity, x.dtype
        )
        if config.enable_edge_collisions:
            pt_diag = pt_diag + assembly.edge_collision_diag(
                colls, state.capacity, x.dtype
            )
        static_diag = static_diag + pt_diag
    matvec = partial(
        assembly.apply_system,
        mass_over_h2=mass_over_h2,
        topo=topo,
        colls=colls,
        strain_contiguous=config.strain_contiguous,
        volume_contiguous=config.volume_contiguous,
        static_diag=static_diag,
        contact_coupling=config.contact_coupling,
        # tet_fused == host-verified identical strain/volume tet lists, so
        # the operator can apply both families in one (w_s+w_v)·GᵀG pass.
        tet_shared=config.tet_fused,
    )

    inv_dense = (
        topo.inv_dense if topo.inv_dense.shape[0] == x.shape[0] else None
    )
    if tetcols.applies(state, topo, colls, config, inv_dense):
        # Tet-column fast path: the system is exactly block-diagonal (see
        # tetcols module docstring), so the whole iteration loop — local
        # step, force, direct 4x4 block solve — runs in corner-major flat
        # columns with no per-iteration layout conversion.
        x, static_proj_fast, residual = tetcols.substep_cols(
            x, msn_h2, diag,
            pt_diag if pt_diag is not None else None,
            state.node_mask, topo, colls, params, config,
        )
        return _finish_substep(
            state, topo, params, config, colls, x, prev,
            static_proj_fast, residual, state.shape_quats, h, mask,
        )
    # Disjoint-tet scenes: the system is block-diagonal in 4x4 blocks (see
    # Topology.tet_block6), so a batched block Cholesky — refactored once
    # per substep from this substep's diagonal, contacts included — is the
    # EXACT system inverse and CG converges in one trip.  Any SPD
    # preconditioner keeps CG correct, so no coupling-mode gate is needed;
    # exactness just needs the off-diagonal contact terms absent
    # (contact_coupling != "full"), which only affects trip count.
    precond_fn = None
    if (
        inv_dense is None
        and topo.tet_block6 is not None
        and topo.tet_block6.shape[-1] * 4 == state.capacity
    ):
        precond_fn = partial(
            assembly.tet_block_apply,
            assembly.tet_block_factor(diag, topo.tet_block6),
        )

    def local_and_force(x, quats, colls_it, pt_diag_it):
        # The shared local-step + force-assembly body of one PD iteration
        # (Solver.cpp:264-349) — used by both the CG and the prefactorized
        # direct global-step paths so the two can never desynchronize.
        local = assembly.local_step(
            x,
            state.inv_mass,
            state.mass,
            quats,
            topo,
            colls_it,
            params.collision_thickness,
            params.floor_height,
            config.rotation_iterations,
            config.reference_quirks,
            config.strain_contiguous,
            config.volume_contiguous,
            radius=state.radius,
            pt_full=(config.contact_coupling == "full"),
            tet_fused=config.tet_fused,
        )
        force = assembly.assemble_force(
            msn_h2,
            local,
            topo,
            colls_it,
            config.strain_contiguous,
            config.volume_contiguous,
            contact_coupling=config.contact_coupling,
            x=x,
            pt_diag=pt_diag_it,
            tet_fused=config.tet_fused,
        )
        return local, force

    def make_iteration(colls_it, pt_diag_it):
        def iteration(_, carry):
            x, quats, residual, _ = carry
            local, force = local_and_force(x, quats, colls_it, pt_diag_it)
            x_new, residual = assembly.pcg_solve(
                lambda v: matvec(v), force, x, diag, config.cg_iterations,
                rtol=config.cg_rtol, inv_dense=inv_dense,
                precond_fn=precond_fn,
            )
            # Padded nodes solve exactly to their park position; re-select
            # to remove CG truncation noise.
            x_new = jnp.where(mask > 0, x_new, x)
            return x_new, local.quats, residual, local.static

        return iteration

    static_rows = (
        state.capacity
        if colls.floor_active.shape[0]
        else colls.static_idx.shape[0]
    )
    static_proj0 = jnp.zeros((static_rows, 3), dtype=x.dtype)
    carry0 = (x, state.shape_quats, jnp.asarray(0.0, x.dtype), static_proj0)

    def run_iters(colls_it, pt_diag_it):
        def fn(carry):
            it = make_iteration(colls_it, pt_diag_it)
            if config.unroll_loops and config.iterations <= 8:
                # Static unroll (see contact_passes' note): removes the
                # iteration loop's carry-layout boundaries and lets XLA
                # fuse the force assembly into the next iteration's local
                # step.  The CG while_loop inside each iteration remains.
                for _i in range(config.iterations):
                    carry = it(_i, carry)
                return carry
            return jax.lax.fori_loop(0, config.iterations, it, carry)

        return fn

    if colls.pt_idx.shape[0] and config.contact_coupling != "full":
        # When no point-tri contact is live this substep, run the PD loop
        # with the pt machinery statically removed (zero-size batch): the
        # per-iteration pt projection + force blocks are exact no-ops but
        # cost ~6 fixed-overhead ops each — a dominant PD-loop cost on
        # small contact-free ticks.  The operator is unchanged: with
        # recentered coupling, contacts enter it only through static_diag,
        # whose DATA is already zero when nothing is live.
        colls_free = replace(
            colls,
            pt_idx=jnp.zeros((0, 4), jnp.int32),
            pt_mask=jnp.zeros((0,), colls.pt_mask.dtype),
        )

        def run_iters_direct(carry):
            # Prefactorized DIRECT solve: with zero contact-diagonal data
            # the system equals the static one whose exact dense inverse is
            # precomputed (Topology.inv_dense — the reference's LLT,
            # Solver.cpp:212-215), so the global step is ONE MXU matmul.
            # The CG call it replaces costs ~0.7 ms/iteration in while-loop
            # trips and matvecs on small scenes — the dominant PD-loop cost
            # on a calm cloth tick.
            def iteration(_, c):
                x, quats, _, _, _ = c
                local, force = local_and_force(
                    x, quats, colls_free, jnp.zeros_like(pt_diag)
                )
                # Full-precision contraction: this matmul IS the global
                # solve, and the TPU's default bf16 matmul inputs would put
                # ~3-digit noise on every contact-free substep position
                # (see ops/precision.py; pcg_solve's inv_dense precondition
                # uses the same wrapper).
                x_new = _einsum("ij,jd->id", inv_dense, force)
                x_new = jnp.where(mask > 0, x_new, x)
                return x_new, local.quats, jnp.asarray(0.0, x.dtype), \
                    local.static, force

            if _UNROLL or config.iterations <= 8:
                # The direct path only exists on small prefactorized scenes
                # (inv_dense, N <= 1024) where per-trip loop overhead
                # (~25-50 us) is a measurable slice of the tick; a static
                # unroll of the (static, small) iteration count removes it
                # and lets XLA fuse across iterations.
                c = carry + (jnp.zeros_like(carry[0]),)
                for _i in range(config.iterations):
                    c = iteration(_i, c)
                x, quats, _, static_proj, force = c
            else:
                x, quats, _, static_proj, force = jax.lax.fori_loop(
                    0, config.iterations, iteration,
                    carry + (jnp.zeros_like(carry[0]),),
                )
            # Exact-solve residual for the observability counters: one
            # matvec AFTER the loop instead of a CG trip inside it.  With
            # zero iterations the force carry is all-zero and the residual
            # would be garbage — report 0.0 like the CG path does.
            if config.iterations > 0:
                r = force - matvec(x)
                residual = jnp.sqrt(jnp.sum(r * r))
            else:
                residual = jnp.asarray(0.0, x.dtype)
            return x, quats, residual, static_proj

        def run_cg(carry):
            return jax.lax.cond(
                jnp.sum(colls.pt_mask) > 0,
                run_iters(colls, pt_diag),
                run_iters(colls_free, jnp.zeros_like(pt_diag)),
                carry,
            )

        if inv_dense is not None and _FORCE_DIRECT:
            x, quats, residual, static_proj = run_iters_direct(carry0)
        elif inv_dense is not None:
            contact_free = (jnp.sum(colls.pt_mask) <= 0) & (
                jnp.sum(static_diag) <= 0
            )
            x, quats, residual, static_proj = jax.lax.cond(
                contact_free, run_iters_direct, run_cg, carry0
            )
        else:
            x, quats, residual, static_proj = run_cg(carry0)
    else:
        x, quats, residual, static_proj = run_iters(colls, pt_diag)(carry0)
    # ``static_proj`` is the final local step's static projection — the
    # reference's stabilization snaps to this stale ``projectedPosition``
    # (computed before the last global solve, Solver.cpp:306-308,379-382).
    return _finish_substep(
        state, topo, params, config, colls, x, prev, static_proj,
        residual, quats, h, mask,
    )


def _finish_substep(
    state: SolverState,
    topo: Topology,
    params: PhysicsParams,
    config: StepConfig,
    colls: CollisionSet,
    x: jax.Array,
    prev: jax.Array,
    static_proj: jax.Array,
    residual: jax.Array,
    quats: jax.Array,
    h,
    mask: jax.Array,
) -> tuple[SolverState, jax.Array]:
    """Stabilization, velocity, friction and state assembly — shared tail of
    the generic and tet-column substep paths (``Solver.cpp:367-484``)."""

    def stabilize(_, carry):
        x, prev = carry
        x, prev = stabilize_point_tri(
            x,
            prev,
            state.inv_mass,
            colls.pt_idx,
            colls.pt_mask,
            params.collision_thickness,
        )
        if config.enable_edge_collisions:
            x, prev = stabilize_edge_edge(
                x,
                prev,
                state.inv_mass,
                colls.edge_idx,
                colls.edge_mask,
                params.collision_thickness,
                config.reference_quirks,
            )
        # Hard snap for floor contacts (Solver.cpp:379-382).
        if colls.floor_active.shape[0]:
            x = jnp.where(colls.floor_active[:, None] > 0, static_proj, x)
        else:
            snap = colls.static_mask[:, None] > 0
            x = x.at[colls.static_idx].set(
                jnp.where(snap, static_proj, x[colls.static_idx])
            )
        return x, prev

    # Contact-activity predicate: stabilization and the contact friction
    # passes are exact no-ops when nothing is in contact, but their gathers,
    # scatters and loop trips still cost ~1 ms/tick on small scenes.  One
    # lax.cond skips them wholesale (detection above still ran, so the
    # predicate is this substep's truth).
    n_contacts = jnp.sum(colls.pt_mask)
    if colls.floor_active.shape[0]:
        n_floor = jnp.sum(colls.floor_active)
    else:
        n_floor = jnp.sum(colls.static_mask)
    any_contact = (n_contacts + n_floor) > 0
    if config.enable_edge_collisions:
        any_contact = any_contact | (jnp.sum(colls.edge_mask) > 0)
    if colls.nn_idx.shape[0]:
        any_contact = any_contact | (jnp.sum(colls.nn_mask) > 0)

    def contact_passes(op):
        x, prev = op
        if config.unroll_loops and config.collision_stabilization_iterations <= 8:
            # Static unroll: the fori_loop's (x, prev) carry forces a
            # layout round-trip at every trip boundary (the body's
            # scatters prefer T(4,128), the loop signature T(8,128) —
            # measured 9 relayout copies/tick ≈ 5 ms on the mixed scene);
            # unrolled, XLA propagates one layout through all passes.
            for _i in range(config.collision_stabilization_iterations):
                x, prev = stabilize(_i, (x, prev))
        else:
            x, prev = jax.lax.fori_loop(
                0, config.collision_stabilization_iterations, stabilize,
                (x, prev),
            )
        vel = (
            (1.0 - params.damping) * (x - prev) / h
            + h * state.forces * state.inv_mass[:, None]
        ) * mask
        if colls.nn_idx.shape[0]:
            vel = _node_node_friction(
                x, vel, state.inv_mass, state.radius, colls, params
            )
        vel = _point_tri_friction(x, vel, state.inv_mass, colls, params)
        vel = _static_floor_friction(
            vel, colls, params, state.capacity, topo.floor_count
        )
        return x, prev, vel

    def free_passes(op):
        x, prev = op
        vel = (
            (1.0 - params.damping) * (x - prev) / h
            + h * state.forces * state.inv_mass[:, None]
        ) * mask
        return x, prev, vel

    x, prev, vel = jax.lax.cond(
        any_contact, contact_passes, free_passes, (x, prev)
    )

    new_state = replace(
        state,
        positions=x,
        prev_positions=x,
        velocities=vel,
        shape_quats=quats,
    )
    if colls.bp is not None:
        new_state = replace(new_state, bp=colls.bp)
    failed = jnp.logical_or(
        colls.overflow, ~jnp.all(jnp.isfinite(x))
    )
    new_state = replace(
        new_state, sim_failed=jnp.logical_or(state.sim_failed, failed)
    )
    return new_state, residual


def _node_node_friction(
    x: jax.Array,
    vel: jax.Array,
    inv_mass: jax.Array,
    radius: jax.Array,
    colls: CollisionSet,
    params: PhysicsParams,
) -> jax.Array:
    acc = node_node_friction_acc(
        x, vel, inv_mass, radius, colls.nn_idx, colls.nn_mask, params
    )
    return vel + acc[:, :3] / jnp.maximum(acc[:, 3], 1.0)[:, None]


def node_node_friction_acc(
    x: jax.Array,
    vel: jax.Array,
    inv_mass: jax.Array,
    radius: jax.Array,
    nn_idx: jax.Array,
    nn_mask: jax.Array,
    params: PhysicsParams,
) -> jax.Array:
    """Node-node friction pass (``Solver.cpp:398-428``), Jacobi-accumulated;
    returns the raw ``[N, 4]`` accumulator (xyz impulse sums + contact
    counts) before count-averaging — halo-reduced across slabs by the
    domain-decomposed solver (parallel/domain.py).

    Touching pairs (center distance ≤ radius sum) damp their relative
    tangential velocity by ``friction``.  The reference's static branch sets
    ``friction = 1.0`` *without* flipping the sign it later negates
    (``Solver.cpp:414-417``), which would amplify rather than cancel the
    relative velocity — dead by default (``staticFrictionThreshold = 0``);
    reproduced literally.
    """
    idx = nn_idx
    pa, pb = x[idx[:, 0]], x[idx[:, 1]]
    diff = pb - pa
    dist = jnp.linalg.norm(diff, axis=-1)
    r = radius[idx[:, 0]] + radius[idx[:, 1]]
    touching = (dist <= r) & (nn_mask > 0)
    n = diff / jnp.maximum(dist, 1e-20)[:, None]

    va, vb = vel[idx[:, 0]], vel[idx[:, 1]]
    rel = vb - va
    perp = rel - jnp.sum(rel * n, axis=-1, keepdims=True) * n
    friction = jnp.where(
        jnp.linalg.norm(perp, axis=-1) < params.static_friction_threshold,
        -1.0,  # the reference's sign-quirked static branch (friction = 1.0f)
        params.friction,
    )
    im = inv_mass[idx]  # [P,2]
    w_sum = jnp.maximum(im[:, 0] + im[:, 1], 1e-20)
    # a.vel += -friction_ref·perp·imA/wSum with friction_ref = −options.friction
    # in the dynamic branch — i.e. a gains +f·perp, b loses f·perp.
    dva = (friction[:, None] * perp) * (im[:, 0] / w_sum)[:, None]
    dvb = -(friction[:, None] * perp) * (im[:, 1] / w_sum)[:, None]
    m = touching.astype(vel.dtype)

    # Count-averaged Jacobi application (cf. _point_tri_friction's note);
    # both node columns + counts in one fused scatter op.
    upd = jnp.concatenate(
        [
            jnp.concatenate([dva * m[:, None], dvb * m[:, None]], axis=0),
            jnp.tile(m, 2)[:, None],
        ],
        axis=-1,
    )
    return jnp.zeros((vel.shape[0], 4), vel.dtype).at[
        idx.T.reshape(-1)
    ].add(upd)


def _point_tri_friction(
    x: jax.Array,
    vel: jax.Array,
    inv_mass: jax.Array,
    colls: CollisionSet,
    params: PhysicsParams,
) -> jax.Array:
    """Point-triangle friction + restitution pass (``Solver.cpp:431-471``),
    Jacobi-accumulated instead of sequential in-place."""
    acc = point_tri_friction_acc(
        x, vel, inv_mass, colls.pt_idx, colls.pt_mask, params
    )
    return vel + acc[:, :3] / jnp.maximum(acc[:, 3], 1.0)[:, None]


def point_tri_friction_acc(
    x: jax.Array,
    vel: jax.Array,
    inv_mass: jax.Array,
    pt_idx: jax.Array,
    pt_mask: jax.Array,
    params: PhysicsParams,
) -> jax.Array:
    """The friction pass's raw ``[N, 4]`` accumulator (xyz impulse sums +
    contact counts) before count-averaging — halo-reduced across slabs by
    the domain-decomposed solver (parallel/domain.py)."""
    from ..collision.batches import capped_contact_acc, gather_cols

    def acc_fn(sl):
        idx = pt_idx[sl]
        mask = pt_mask[sl]
        pa, pb, pc, pd_ = gather_cols(x, idx)
        va, vb, vc, vd = gather_cols(vel, idx)
        im = inv_mass[idx]

        avg_tri_vel = (vb + vc + vd) / 3.0
        n = jnp.cross(pc - pb, pd_ - pb)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        rel = va - avg_tri_vel
        v_dot_n = jnp.sum(rel * n, axis=-1)
        perp = rel - v_dot_n[:, None] * n

        friction = jnp.where(
            jnp.linalg.norm(perp, axis=-1) < params.static_friction_threshold,
            1.0,
            params.friction,
        )
        tri_w = im[:, 1] + im[:, 2] + im[:, 3]
        w_sum = jnp.maximum(im[:, 0] + tri_w, 1e-20)
        dv = (
            -friction[:, None] * perp
            - 1.1 * jnp.minimum(v_dot_n, 0.0)[:, None] * n
        ) * mask[:, None]

        # The reference applies these impulses sequentially, recomputing the
        # relative velocity per constraint (Solver.cpp:431-471): the first
        # contact neutralizes vDotN and later contacts on the same node are
        # near-no-ops.  A raw Jacobi sum would apply k restitution kicks to a
        # node with k contacts and detonate dense piles; count-averaging is
        # the stable batched equivalent of "first application wins".  All
        # four node columns + counts ride one fused scatter op.
        m = mask[:, None]
        share = -dv * (tri_w / w_sum)[:, None]
        point = dv * (im[:, 0] / w_sum)[:, None]
        blk_a = jnp.concatenate([point, m], axis=-1)
        blk_t = jnp.concatenate([share, m], axis=-1)
        ui = jnp.concatenate([blk_a, blk_t, blk_t, blk_t], axis=0)
        return (
            jnp.zeros((vel.shape[0], 4), vel.dtype)
            .at[idx.T.reshape(-1)]
            .add(ui)
        )

    # Whole pass (gathers included) truncates to the live contact prefix
    # when few contacts are live — see capped_contact_acc.
    return capped_contact_acc(pt_idx, jnp.sum(pt_mask), acc_fn)


def _static_floor_friction(
    vel: jax.Array,
    colls: CollisionSet,
    params: PhysicsParams,
    num_nodes: int,
    floor_count: jax.Array | None = None,
) -> jax.Array:
    """Floor friction pass (``Solver.cpp:473-484``).

    The reference applies one ``v_xz *= (1−f)`` per static-collision entry,
    sequentially; a node hit by k entries decays by ``(1−f)^k``.  The closed
    form reproduces that, evaluating the static-friction threshold at the
    pre-pass velocity (divergence from mid-sequence threshold crossings is
    documented in FIDELITY.md).
    """
    if colls.floor_active.shape[0]:
        counts = floor_count * colls.floor_active
    else:
        counts = jax.ops.segment_sum(
            colls.static_mask, colls.static_idx, num_segments=num_nodes
        )
    perp = vel.at[:, 1].set(0.0)
    static = jnp.linalg.norm(perp, axis=-1) < params.static_friction_threshold
    factor = jnp.where(
        static, jnp.zeros_like(counts), (1.0 - params.friction) ** counts
    )
    factor = jnp.where(counts > 0, factor, 1.0)
    scaled = vel * factor[:, None]
    return vel.at[:, 0].set(scaled[:, 0]).at[:, 2].set(scaled[:, 2])
