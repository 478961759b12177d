"""Simulation state as a pytree of SoA device arrays.

The reference keeps an AoS ``std::vector<Node>`` (``Node.h:8-20``: id,
position, prevPosition, velocity, force, radius, invMass).  TPU-native state is
structure-of-arrays with a static, padded particle count so every step compiles
once and runs with fixed shapes:

* ``positions / prev_positions / velocities / forces``: ``f32[N, 3]``
* ``inv_mass / mass / radius``: ``f32[N]``
* ``node_mask``: ``f32[N]`` — 1 for live particles, 0 for padding
* ``shape_quats``: ``f32[G, 4]`` — persistent per-shape-matching-group rotation
  estimate (the reference's ``_currentRotation`` warm start,
  ``ShapeMatchingConstraint.h:33``); it is *simulation state*, not topology.
* ``sim_failed``: ``bool[]`` — the ``_simFailed`` latch (``Solver.h:198``):
  once set, stepping becomes a no-op (``Solver.cpp:26-28``).  Here it also
  latches on padded-buffer overflow and non-finite positions.

Padding policy: padded particles are parked on a line far outside any scene
(one per broadphase cell so they can never overflow a cell bucket), with
``inv_mass = 0`` and ``node_mask = 0``; every kernel multiplies its writes by
the mask, so they stay exactly at the park position forever.

Because the state is a pytree, checkpoint/resume (absent in the reference,
SURVEY §5) is a free ``save``/``load`` of its leaves.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

PARK_BASE = 1.0e5  # world-space offset of the padding parking line
PARK_PITCH = 64.0  # spacing between parked particles (>> any grid spacing)


@jax.tree_util.register_dataclass
@dataclass
class BroadphaseCache:
    """Temporal broadphase cache (Verlet/neighbor-list style).

    The packed-body broadphase's candidate pairs stay valid while no node
    has moved more than ``PhysicsParams.broadphase_slack`` (per axis) from
    where they were when the grid was last built: the prefilter at build
    time inflates its AABB test by 2x that slack, so the cached pair set is
    a superset of every exact AABB-overlap set reachable without tripping
    the displacement bound.  The narrowphase re-tests cached pairs exactly
    at the CURRENT positions every substep, so contacts themselves are
    never stale.  The reference rebuilds its spatial hash every substep
    (``Solver.cpp:693``) because CPU hash inserts are cheap; on TPU the
    build+query+gather chain is the detection cost, and a conservative
    displacement bound removes it from quiescent substeps entirely.
    """

    pairs: jax.Array  # i32[K, NB] packed candidate bodies per body
    valid: jax.Array  # bool[K, NB]
    ref: jax.Array  # f32[M, 3] body-node positions at build time
    fresh: jax.Array  # bool[] — False forces a rebuild (initial state)


@jax.tree_util.register_dataclass
@dataclass
class NodePairCache:
    """Temporal node-pair cache for the PBD node-node response.

    The reference rebuilds ``_spatialHashNodes`` every solver iteration
    (``Solver.cpp:81-83``); on TPU the grid build/query/dedup chain is the
    dominant per-iteration cost of a node pile.  The reference's own
    ``radiusPadding = 0.5`` (``Solver.cpp:883``) supplies a free displacement
    bound: padded node AABBs overlap whenever per-axis center distance is
    within ``r_i + r_j + 1.0``, while a *touching* pair only needs the
    Euclidean distance within ``r_i + r_j`` — so as long as no node has
    drifted more than 0.5 (per axis) from where the grid was last built, the
    cached pair set is a superset of every touching set, and the response's
    exact ``disp > 0`` test on CURRENT positions keeps the physics identical.

    Pairs are compacted to a sorted valid prefix at build time so the
    per-iteration response runs on a width-adaptive slice (~2x the live pair
    count) instead of the full ``N x budget`` candidate lattice.
    """

    pi: jax.Array  # i32[NB] pair node i, valid prefix first
    pj: jax.Array  # i32[NB] pair node j
    count: jax.Array  # i32[] live prefix length
    ref: jax.Array  # f32[N, 3] positions at build time
    fresh: jax.Array  # bool[] — False forces a rebuild


@jax.tree_util.register_dataclass
@dataclass
class SolverState:
    positions: jax.Array  # f32[N, 3]
    prev_positions: jax.Array  # f32[N, 3]
    velocities: jax.Array  # f32[N, 3]
    forces: jax.Array  # f32[N, 3]   (Node::force, Solver.cpp:224-226)
    inv_mass: jax.Array  # f32[N]
    mass: jax.Array  # f32[N]  (1/inv_mass for live nodes; PD diagonal)
    radius: jax.Array  # f32[N]
    node_mask: jax.Array  # f32[N]
    shape_quats: jax.Array  # f32[G, 4]  (w, x, y, z) per shape-match group
    sim_failed: jax.Array  # bool[]
    # Packed-body broadphase cache; None unless host._prepare sized it for
    # the scene's uniform-body layout.
    bp: BroadphaseCache | None = None
    # Node-pair cache for the PBD response; None unless host._prepare
    # allocated it (PBD solver with collisions enabled).
    nn: NodePairCache | None = None

    @property
    def capacity(self) -> int:
        return self.positions.shape[-2]


def empty_broadphase_cache(k: int, nb: int, m: int) -> BroadphaseCache:
    """Unpopulated cache (``fresh=False`` → first detection rebuilds)."""
    return BroadphaseCache(
        pairs=np.zeros((k, nb), np.int32),
        valid=np.zeros((k, nb), bool),
        ref=np.zeros((m, 3), np.float32),
        fresh=np.asarray(False),
    )


def empty_node_pair_cache(n: int, bwidth: int) -> NodePairCache:
    """Unpopulated node-pair cache (``fresh=False`` → first use rebuilds)."""
    return NodePairCache(
        pi=np.zeros(n * bwidth, np.int32),
        pj=np.zeros(n * bwidth, np.int32),
        count=np.asarray(0, np.int32),
        ref=np.zeros((n, 3), np.float32),
        fresh=np.asarray(False),
    )


def park_positions(num_padded: int, offset: int = 0) -> np.ndarray:
    """Distinct far-away positions for padded particles."""
    idx = np.arange(num_padded, dtype=np.float32) + float(offset)
    park = np.zeros((num_padded, 3), dtype=np.float32)
    park[:, 0] = PARK_BASE + PARK_PITCH * idx
    park[:, 1] = PARK_BASE
    return park


def make_state(
    positions: np.ndarray,
    *,
    velocities: np.ndarray | None = None,
    inv_mass: np.ndarray | None = None,
    radius: np.ndarray | None = None,
    capacity: int | None = None,
    num_shape_groups: int = 0,
    dtype=jnp.float32,
) -> SolverState:
    """Build a padded device state from host arrays.

    ``capacity`` pads the particle count (default: round up to a multiple of
    8 so float32 sublanes are full; scenes that will grow can over-allocate to
    avoid recompiles, mirroring how the reference re-runs its precomputation
    only when the node count changes, ``Solver.cpp:168``).
    """
    positions = np.asarray(positions, dtype=np.float32).reshape(-1, 3)
    n = positions.shape[0]
    if capacity is None:
        capacity = max(8, -(-n // 8) * 8)
    if capacity < n:
        raise ValueError(f"capacity {capacity} < particle count {n}")
    pad = capacity - n

    if velocities is None:
        velocities = np.zeros_like(positions)
    if inv_mass is None:
        inv_mass = np.ones(n, dtype=np.float32)
    if radius is None:
        radius = np.full(n, 0.5, dtype=np.float32)
    velocities = np.asarray(velocities, dtype=np.float32).reshape(-1, 3)
    inv_mass = np.asarray(inv_mass, dtype=np.float32).reshape(-1)
    radius = np.asarray(radius, dtype=np.float32).reshape(-1)

    pos_full = np.concatenate([positions, park_positions(pad)], axis=0)
    vel_full = np.concatenate([velocities, np.zeros((pad, 3), np.float32)], axis=0)
    inv_mass_full = np.concatenate([inv_mass, np.zeros(pad, np.float32)])
    # Padded nodes get mass 1 so the PD system diagonal stays positive
    # definite; their solution is exactly their park position.
    with np.errstate(divide="ignore"):
        mass_live = np.where(inv_mass > 0, 1.0 / np.maximum(inv_mass, 1e-30), 0.0)
    mass_full = np.concatenate([mass_live.astype(np.float32), np.ones(pad, np.float32)])
    radius_full = np.concatenate([radius, np.zeros(pad, np.float32)])
    mask_full = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])

    quats = np.zeros((max(num_shape_groups, 1), 4), dtype=np.float32)
    quats[:, 0] = 1.0  # identity rotation (w, x, y, z)

    # NumPy leaves: the caller uploads the whole pytree in one device_put.
    as_dev = lambda x: np.asarray(x, dtype=np.float32)
    return SolverState(
        positions=as_dev(pos_full),
        prev_positions=as_dev(pos_full),
        velocities=as_dev(vel_full),
        forces=np.zeros((capacity, 3), np.float32),
        inv_mass=as_dev(inv_mass_full),
        mass=as_dev(mass_full),
        radius=as_dev(radius_full),
        node_mask=as_dev(mask_full),
        shape_quats=as_dev(quats),
        sim_failed=np.asarray(False),
    )


def latch_failure(state: SolverState, failed_now: jax.Array) -> SolverState:
    """Sticky ``_simFailed`` semantics (``Solver.cpp:852-856``)."""
    return replace(state, sim_failed=jnp.logical_or(state.sim_failed, failed_now))


def save_state(path: str, state: SolverState) -> None:
    """Checkpoint: the state is a pytree, so this is a flat npz dump."""
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_state(path: str, like: SolverState) -> SolverState:
    """Restore a checkpoint written by :func:`save_state`."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [
        jnp.asarray(data[f"leaf_{i}"], dtype=leaf.dtype)
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
