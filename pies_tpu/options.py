"""Solver configuration.

The reference folds every tunable into a single ``SolverOptions`` struct
(``/root/reference/Include/Pies/Solver.h:23-38``).  A TPU-native design has to
split the same surface into two halves:

* **Static config** (:class:`StepConfig`): anything that changes the *shape or
  structure* of the compiled XLA program — solver kind, iteration counts,
  substeps, capacity budgets.  These are hashable and passed as
  ``static_argnums`` to ``jax.jit``; changing them triggers a recompile, which
  mirrors the reference re-running its precomputation when topology changes
  (``Solver.cpp:168-221``).

* **Dynamic params** (:class:`PhysicsParams`): plain floats that become scalar
  operands of the compiled program — gravity, damping, friction, timestep...
  These can be retuned every tick without recompiling (the reference re-reads
  them from ``_options`` each tick).

:class:`SolverOptions` mirrors the reference's public struct field-for-field so
a Pies user can port a scene setup unchanged, and maps into the two halves.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp


class SolverName(enum.Enum):
    """Mirrors ``Pies::SolverName`` (``Solver.h:21``)."""

    PBD = "pbd"
    PD = "pd"


@dataclass(frozen=True)
class SolverOptions:
    """Field-for-field mirror of ``Pies::SolverOptions`` (``Solver.h:23-38``).

    Defaults are identical to the reference.  ``thread_count`` is accepted for
    API parity but has no effect: all parallelism lives inside one XLA program
    (replacing the ``std::thread`` fan-out at ``Solver.cpp:558-566,838-846``).
    """

    fixed_timestep_size: float = 0.012
    time_substeps: int = 1
    iterations: int = 4
    collision_stabilization_iterations: int = 4
    collision_threshold_distance: float = 0.1
    collision_thickness: float = 0.05
    gravity: float = 10.0
    damping: float = 0.006
    friction: float = 0.01
    static_friction_threshold: float = 0.0
    floor_height: float = 0.0
    grid_spacing: float = 2.0
    thread_count: int = 8  # accepted for parity; unused on TPU
    solver: SolverName = SolverName.PD


@dataclass(frozen=True)
class CollisionBudget:
    """Static capacity budgets for the fixed-shape collision pipeline.

    The reference grows ``std::vector``s dynamically and only latches
    ``_simFailed`` when bucket counts explode (>1000 buckets per tri or >1000
    entries per bucket, ``Solver.cpp:741-755``).  Under XLA every buffer is
    static, so each stage has an explicit capacity; overflowing any of them
    sets the same sim-failed latch (see ``state.SolverState.sim_failed``).
    """

    # Max grid cells a swept triangle AABB may cover (reference caps the
    # per-axis range at 20 cells, Solver.cpp:672; total cells 20^3 is not
    # representable statically — budget the common case and latch overflow).
    # In quirk mode the triangle grid has unit cells (world-space range
    # computation, Solver.cpp:659-670), so multi-unit triangles cover many
    # cells; 64 covers a 4x2x6-cell AABB.
    max_cells_per_tri: int = 64
    # Max entries scanned per grid cell (reference latches at 1000/bucket).
    max_entries_per_cell: int = 16
    # Candidate triangles gathered per query triangle.  Self-entries count
    # toward the budget (dedup happens after the gather), so this must cover
    # own-cell count + neighbors.
    max_candidates_per_tri: int = 64
    # Fixed capacity of the per-substep point-triangle contact buffer; the
    # host sizes this from the scene's triangle count.
    max_point_tri_contacts: int = 256
    # Fixed capacity of the per-substep edge-edge contact buffer (only used
    # when StepConfig.enable_edge_collisions is on).
    max_edge_contacts: int = 256
    # Narrowphase budget after the AABB-overlap prefilter (true neighbors).
    max_narrow_candidates: int = 32
    # Uniform collision-body stride: when every scene body is exactly this
    # many contiguous triangles (e.g. 4 faces per tet in a tet soup, detected
    # by the host), the broadphase runs at body granularity — insertion,
    # candidate gathering, and the first AABB cull shrink by stride (and the
    # candidate gather by stride^2).  1 = per-triangle (general scenes).
    body_stride: int = 1
    # Candidate bodies gathered per query body (body-stride mode).
    max_candidates_per_body: int = 24
    # Surviving candidate bodies after the body-level AABB cull.
    max_narrow_bodies: int = 8
    # Node-node broadphase (PBD path): neighbor candidates per node.
    max_candidates_per_node: int = 32
    max_cells_per_node: int = 27
    # Fixed capacity of the PD node-node contact buffer (only used when
    # StepConfig.enable_node_collisions is on).
    max_node_node_contacts: int = 256


@dataclass(frozen=True)
class StepConfig:
    """Hashable static half of the configuration (jit-static)."""

    solver: SolverName = SolverName.PD
    time_substeps: int = 1
    iterations: int = 4
    collision_stabilization_iterations: int = 4
    # Statically unroll the small fixed-trip solver loops (PD iterations,
    # stabilization, tet-column loop): removes per-trip carry-layout
    # boundaries and lets XLA fuse across iterations (round-5: several
    # ms/tick on mid-size scenes).  Ensemble rollouts (vmap over scenes)
    # disable it — the 4x-unrolled body under vmap x64 schedules worse
    # than the rolled loop.
    unroll_loops: bool = True
    # Conjugate-gradient iterations for the PD global step.  The reference
    # solves exactly with a prefactored sparse Cholesky (Solver.cpp:212-215);
    # matrix-free Jacobi-PCG replaces it (SURVEY §2.7 item 6).  16 iterations
    # reach constraint residuals at float32 noise on the canonical scenes
    # (the warm start from the previous iteration's positions does most of
    # the work); fidelity tests crank this up and compare to a dense solve.
    cg_iterations: int = 16
    # Relative early-exit tolerance for the CG loop (0 = fixed trip count).
    # Nonzero switches to a while_loop capped at cg_iterations that stops
    # once the preconditioned residual falls below rtol·initial —
    # deterministic (data-dependent trips, static shapes); clean scenes stop
    # paying for the worst case.
    cg_rtol: float = 0.0
    # Müller rotation-extraction iterations for shape matching.  The reference
    # runs up to 100 with an early break (ShapeMatchingConstraint.cpp:79-93);
    # the iteration is a no-op after convergence so a fixed count is exact.
    rotation_iterations: int = 20
    # Enable the node-node / point-triangle collision pipelines (broadphase +
    # narrowphase).  Scenes without self-collision skip the sort entirely.
    enable_collisions: bool = True
    # Enable the edge-edge collision pipeline (sweep + constraint +
    # stabilization).  Off by default — the reference's generation is
    # commented out (Solver.cpp:799-823) — but fully functional as the
    # rebuilt capability (SURVEY §2.3).
    enable_edge_collisions: bool = False
    # Dense floor contacts: the PD sweep's per-(triangle, corner) static
    # entries (Solver.cpp:829-834) collapse to per-node multiplicity counts x
    # a dense activity mask — mathematically identical (all entries of a node
    # share their test and projection) and removes the T·3-row gather/scatter
    # from the force, diagonal, stabilization and friction passes (measured
    # dominant at stress scale).  False restores the entry-list path.
    dense_floor: bool = True
    # Enable the PD node-node collision machinery: constraint generation
    # from the node grid (Solver.cpp:509-607), the w=1e5 diagonal-only
    # constraint (CollisionConstraint.cpp:7-65) and the node-node friction
    # pass (Solver.cpp:398-428).  Dormant in the reference (the generation
    # sweep is caller-less and tickPD reads an always-empty list); rebuilt
    # as the capability SURVEY §2.5 scopes.  Off by default.
    enable_node_collisions: bool = False
    # Reproduce reference quirks bit-for-bit (see FIDELITY.md):
    #  * static floor constraint projects to y=0 regardless of floor_height
    #    (CollisionConstraint.cpp:452-454 vs detection at Solver.cpp:831)
    #  * triangle broadphase computes cell ranges in world units, ignoring
    #    grid_spacing (Solver.cpp:659-670)
    reference_quirks: bool = True
    # Triangle broadphase: "celllist" (default, sorted cell list with one
    # home-cell entry per triangle — the performance path) or "reference"
    # (quirk-faithful multi-cell insertion matching the reference's bucket
    # semantics; see collision/broadphase.py).
    broadphase_mode: str = "celllist"
    # Strain and volume constraints cover the SAME tet list (the reference
    # emits one of each per tet, PrimitiveUtilities.cpp:287-316): the local
    # step computes the shared deformation gradient + 3x3 SVD once and emits
    # one combined force buffer (projections.tet_force12_fused).  Detected
    # host-side at prepare time.
    tet_fused: bool = False
    # Scenes with at most this many triangles (and no body structure) skip
    # the sorted grid for a dense [T, T] all-pairs AABB test — the grid's
    # ~25 fixed-overhead ops dominate tiny ticks, and the all-pairs overlap
    # set is exact (see broadphase._detect_point_tri_allpairs).
    allpairs_broadphase_max: int = 1024
    # Element-major layout specializations, set by the host when the builder
    # detects them.  TPU random gathers run ~30M/s and scatters ~9M/s; when
    # a batch's node indices are exactly arange (element-major emission, e.g.
    # tet soups), its gathers become reshapes and its scatter-adds become
    # slice adds — both full-bandwidth.
    strain_contiguous: bool = False
    volume_contiguous: bool = False
    # Packed-body broadphase/narrowphase (set by the host when every
    # collision body owns a contiguous block of ``body_nodes`` nodes starting
    # at ``body_node_offset + b*body_nodes`` and its ``body_stride``
    # triangles reference the same local corner pattern ``body_faces``).
    # The whole pair narrowphase then runs on single packed rows per body
    # (one gather per candidate body instead of ~3 per candidate triangle
    # corner), and each unique (corner, face) pair is CCD-tested once.
    body_nodes: int = 0
    body_node_offset: int = 0
    body_faces: tuple = ()
    # Super-body broadphase (the GENERAL fast path, set by the host when the
    # scene has triangles but no all-covering uniform body layout): bodies
    # 0..super_packed_k-1 are a uniform packed prefix (super_packed_m
    # contiguous nodes each starting at super_packed_off — e.g. the tet soup
    # part of a mixed scene), every remaining triangle is its own "loose"
    # body with explicit corner indices (Topology.super_corners, rows padded
    # to the packed corner width).  One grid, one narrowphase, one temporal
    # cache cover both classes; pure-loose scenes (cloth, shared-node
    # surface meshes) run with super_packed_k == 0.  Shared-node pair
    # exclusion (Solver.cpp:757-770) is STATIC topology and pre-dropped at
    # candidate time via Topology.super_adj.  super_k == 0 disables.
    super_k: int = 0  # total body rows (incl. padding)
    super_packed_k: int = 0  # leading uniform packed bodies
    super_packed_m: int = 0  # nodes per packed body
    super_packed_off: int = 0  # first node id of packed body 0
    super_live_k: int = 0  # live rows (packed + real loose)
    # Local corner patterns for every face slot; the first super_packed_e
    # entries are the packed bodies' faces, slot super_loose_face (= index of
    # (0, 1, 2), appended if absent; -1 when no loose rows) is the single
    # face of a loose triangle row.  Corner-slot width x len(super_faces)
    # must fit the 32-bit combo mask.
    super_faces: tuple = ()
    super_packed_e: int = 0
    super_loose_face: int = -1
    # Temporal broadphase caching for the packed-body path: reuse the
    # candidate-pair buffer across substeps until some node moves more than
    # ``PhysicsParams.broadphase_slack`` from the cached reference (see
    # state.BroadphaseCache).  Effective only when the host allocated a
    # cache (SolverState.bp) and slack > 0.
    bp_cache: bool = True
    # How point-triangle contacts enter the PD global operator:
    #  * "full": the exact w·AᵀA block, like the reference's collision matrix
    #    (Solver.cpp:242-262) — costs a contact-buffer gather+scatter in every
    #    CG apply (~64 applies/substep; TPU scatters run ~9M rows/s, so this
    #    dominated stress-scale ticks);
    #  * "recentered": only the AᵀA diagonal enters the operator (folded into
    #    the dense per-node diagonal once per substep); the off-diagonal
    #    coupling is recentered into the per-PD-iteration RHS as
    #    w·AᵀA·(p − x_k) + D_c·x_k, whose fixed point over the PD iterations
    #    is IDENTICAL to full coupling — one rank-1 scatter per iteration
    #    instead of per CG apply.  (The earlier "diagonal" mode, which lagged
    #    the off-diagonals without recentering and measured too soft —
    #    stacked bodies sank — is superseded; the string is kept as an alias
    #    of the corrected form.)
    contact_coupling: str = "full"
    # Colored Gauss-Seidel for the PBD distance projection: cumulative END
    # offsets of the color classes in the (host-reordered) distance batch.
    # The reference projects constraints sequentially in place
    # (Constraints.h:121-129, applied at Solver.cpp:59-75) — tension
    # propagates through a whole chain per iteration, which the batched
    # Jacobi form cannot do (it diverges beyond ~32 chain links at 4
    # iterations, FIDELITY.md #19).  A build-time greedy coloring groups
    # conflict-free constraints; classes are projected sequentially inside
    # the jitted iteration with the reference's exact per-constraint update
    # (no count-averaging — within a class no node is touched twice), so
    # every projection reads fully-updated positions of every conflicting
    # constraint.  Empty = the legacy count-averaged Jacobi form.
    distance_colors: tuple = ()
    # EXACT sequential PBD distance projection for chain scenes (ropes):
    # the host detected that the constraints partition into node-disjoint
    # chase chains (Topology.chains) and a lax.scan down the link axis
    # reproduces the reference's in-emission-order projection exactly —
    # tension traverses a whole rope per iteration (Solver.cpp:65-67).
    # Takes precedence over distance_colors.
    distance_chain: bool = False
    # Tet-column PD fast path (solver/tetcols.py): for disjoint-tet scenes
    # with diagonal-only contact coupling the global system is exactly
    # block-diagonal, and the whole local/force/solve iteration runs in
    # corner-major flat columns — no node-major <-> tet-major relayouts
    # inside the loop (measured 11.8 ms/tick of pure data formatting at
    # 500k particles).  Auto-gated by tetcols.applies(); False forces the
    # generic pcg path (used by the equivalence tests).
    tet_cols: bool = True
    budget: CollisionBudget = CollisionBudget()
    dtype: str = "float32"


@jax.tree_util.register_dataclass
@dataclass
class PhysicsParams:
    """Dynamic (traced) scalar parameters of a step; a small pytree.

    One-to-one with the float fields of ``SolverOptions``.
    """

    dt: jax.Array  # fixed_timestep_size / time_substeps (Solver.cpp:41-42,165)
    gravity: jax.Array
    damping: jax.Array
    friction: jax.Array
    static_friction_threshold: jax.Array
    floor_height: jax.Array
    collision_threshold_distance: jax.Array
    collision_thickness: jax.Array
    grid_spacing: jax.Array
    # PBD-only public toggle gating position-constraint projection
    # (Solver.h:52, Solver.cpp:59-63). 1.0 = hinge released (skip pins).
    release_hinge: jax.Array
    # Cell size of the cell-list triangle broadphase (world units).  Traced,
    # so the host can retune it per scene without recompiling; must exceed
    # the largest swept triangle AABB extent (violations latch overflow).
    broadphase_cell: jax.Array
    # Temporal broadphase-cache displacement bound (world units, per axis):
    # the packed-body candidate pairs are rebuilt only when some node has
    # moved more than this from the cached reference positions; the cached
    # prefilter inflates its AABB test by 2x this value so the cached pair
    # set stays a superset in between (state.BroadphaseCache).  0 disables
    # caching (every substep rebuilds).  Must stay well under the typical
    # inter-body gap or the inflated prefilter admits every neighbor.
    broadphase_slack: jax.Array


def split_options(options: SolverOptions, **config_overrides) -> tuple[StepConfig, PhysicsParams]:
    """Map the reference-shaped options onto (static, dynamic) halves."""
    config = StepConfig(
        solver=options.solver,
        time_substeps=int(options.time_substeps),
        iterations=int(options.iterations),
        collision_stabilization_iterations=int(
            options.collision_stabilization_iterations
        ),
        **config_overrides,
    )
    params = make_params(options)
    return config, params


def make_params(
    options: SolverOptions,
    release_hinge: bool = False,
    broadphase_cell: float = 1.0,
    broadphase_slack: float = 0.0,
) -> PhysicsParams:
    f32 = jnp.float32
    return PhysicsParams(
        dt=f32(options.fixed_timestep_size / max(1, options.time_substeps)),
        gravity=f32(options.gravity),
        damping=f32(options.damping),
        friction=f32(options.friction),
        static_friction_threshold=f32(options.static_friction_threshold),
        floor_height=f32(options.floor_height),
        collision_threshold_distance=f32(options.collision_threshold_distance),
        collision_thickness=f32(options.collision_thickness),
        grid_spacing=f32(options.grid_spacing),
        release_hinge=f32(1.0 if release_hinge else 0.0),
        broadphase_cell=f32(broadphase_cell),
        broadphase_slack=f32(broadphase_slack),
    )
