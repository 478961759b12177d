"""Multi-scene ensembles and multi-chip sharding.

The reference's only parallelism is intra-process CPU threads (SURVEY §2.8);
scaling past one chip is new scope, designed the JAX way:

* **Ensemble data parallelism**: a batch of independent scene states steps
  under one ``vmap``-ed tick; the batch axis shards across a device ``Mesh``
  ("dp"), so the 64-scene rollout of BASELINE config 5 rides the whole slice
  with zero cross-replica traffic in the hot loop.
* **Cross-chip reductions**: global diagnostics (ensemble max residual, the
  any-scene-failed latch) use ``psum``/``pmax`` over the mesh axis — the ICI
  collectives that replace nothing in the reference (it has no distributed
  backend) but make fleet health observable in one hop.

Topology and physics parameters are replicated; only the state batch is
sharded.  Per-scene heterogeneity (different stiffness, gravity, ...) can be
expressed by making ``PhysicsParams`` fields batched — they are ordinary
traced operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..options import PhysicsParams, StepConfig
from ..state import SolverState
from ..topology import Topology
from ..solver.step import tick


def stack_ensemble(state: SolverState, n: int) -> SolverState:
    """Replicate a scene state into an ``n``-member batched ensemble."""
    return jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf[None], (n,) + leaf.shape), state
    )


def ensemble_tick(
    states: SolverState,
    topo: Topology,
    params: PhysicsParams,
    config: StepConfig,
):
    """One tick of every ensemble member: ``vmap`` over the state batch with
    shared topology/params.  Returns ``(states, residuals[n])``."""
    return jax.vmap(lambda s: tick(s, topo, params, config))(states)


def ensemble_tick_n(
    states: SolverState,
    topo: Topology,
    params: PhysicsParams,
    config: StepConfig,
    n: int,
):
    """``n`` ticks of every ensemble member in ONE dispatch (``lax.scan``
    over :func:`ensemble_tick`) — the ensemble analog of ``tick_n``.

    Per-dispatch overhead through the remote-TPU tunnel is tens of
    milliseconds; a per-tick host loop was the dominant cost of the
    ensemble bench row (VERDICT r4 #9: scene-throughput flat across rounds
    while the single-scene tick got 15x faster — the single-scene rows
    batch their ticks, the ensemble row did not).
    """

    def body(s, _):
        s2, res = ensemble_tick(s, topo, params, config)
        return s2, jnp.max(res)

    states, residuals = jax.lax.scan(body, states, None, length=n)
    return states, residuals[-1]


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_ensemble(states: SolverState, mesh: Mesh, axis: str = "dp") -> SolverState:
    """Place the ensemble batch axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), states
    )


def make_sharded_step(mesh: Mesh, config: StepConfig, axis: str = "dp"):
    """Compile the full ensemble step over the mesh.

    Inside ``shard_map`` each device advances its local ensemble shard
    (topology/params arrive replicated), then the mesh reduces the fleet
    diagnostics: max CG residual (``pmax``) and the any-member-failed latch
    (``psum`` of failure counts) ride the ICI.

    Returns ``step(states, topo, params) -> (states, max_residual,
    num_failed)``.
    """
    state_spec = jax.tree_util.tree_map(lambda _: P(axis), _state_struct())

    def local_step(states, topo, params):
        states, residuals = jax.vmap(
            lambda s: tick(s, topo, params, config)
        )(states)
        max_residual = jax.lax.pmax(jnp.max(residuals), axis)
        num_failed = jax.lax.psum(
            jnp.sum(states.sim_failed.astype(jnp.int32)), axis
        )
        return states, max_residual, num_failed

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, P(), P()),
        out_specs=(state_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def _state_struct():
    """A structural stand-in with one leaf per SolverState field."""
    import dataclasses

    return SolverState(
        **{f.name: 0 for f in dataclasses.fields(SolverState)}
    )
