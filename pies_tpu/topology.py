"""Constraint topology as typed, padded device batches.

The reference stores one C++ object per constraint in per-type vectors on the
``Solver`` (``Solver.h:157-163``) and loops over them (``Solver.cpp:264-349``).
The TPU-native form is one *batch* per constraint type: index arrays plus
per-constraint parameter arrays, padded to a static capacity with weight 0 so
that every kernel is a fixed-shape gather → project → scatter.

Everything here is built on the host in NumPy at scene-construction time (the
reference's analogous precompute: ``createDistanceConstraint`` etc. in
``Constraints.cpp:39-56,130-184,257-310``).  Leaves stay NumPy; the host
uploads the whole pytree with ONE ``jax.device_put`` (per-array transfers
measured minutes of tunnel latency at stress-scene scale).  The
``Topology`` pytree is a *traced* argument of the compiled step — its shapes
are static but its values are not, so e.g. goal-constraint transforms
(``updateFixedRegions``, ``PrimitiveUtilities.cpp:114-128``) can be updated
every frame without recompiling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

_F32 = np.float32
_I32 = np.int32


def _round_up(n: int, m: int) -> int:
    # Empty batches stay size 0: every kernel op on them is statically
    # elided (a single scatter op costs ~2.5 ms fixed on v5e regardless of
    # row count, so padding empties to 8 rows is pure per-substep overhead).
    if n == 0:
        return 0
    return -(-n // m) * m


def _pad2(a: np.ndarray, cap: int, fill=0) -> np.ndarray:
    out = np.full((cap,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


# ---------------------------------------------------------------------------
# Batch types
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class DistanceBatch:
    """``DistanceConstraint`` batch (``Constraints.h:147-157``).

    ``A = B = [[.5,-.5],[-.5,.5]]`` so ``AᵀA = A`` (idempotent up to the 0.5
    scale), which the PD operator exploits in closed form.
    """

    idx: jax.Array  # i32[C, 2]
    rest: jax.Array  # f32[C]   rest length captured at creation
    w: jax.Array  # f32[C]   constraint weight; 0 ⇒ padding


@jax.tree_util.register_dataclass
@dataclass
class PositionBatch:
    """``PositionConstraint`` batch (``Constraints.h:159-169``); A = B = I₁."""

    idx: jax.Array  # i32[C]
    target: jax.Array  # f32[C, 3]  fixedPosition captured at creation
    w: jax.Array  # f32[C]


@jax.tree_util.register_dataclass
@dataclass
class TetBatch:
    """Shared batch for ``TetrahedralConstraint`` (strain limiting) and
    ``VolumeConstraint`` (``Constraints.h:171-213``).

    ``g`` is the 3x4 matrix G with ``A = [0; G]`` mapping the four stacked
    node coordinates to the deformation gradient per axis (the
    ``diffToBary · worldToDiff`` product of ``Constraints.cpp:141-175``), so
    ``AᵀA x = Gᵀ(G x)`` and ``Aᵀ B p = Gᵀ F̂ᵀ`` — no 4x4 matrices stored.
    """

    idx: jax.Array  # i32[C, 4]
    # qinv/g are stored TRANSPOSED-FLAT: row r of ``qinv`` is the (i, j) =
    # (r // 3, r % 3) entry column f32[C]; row r of ``g`` the (j, a) =
    # (r // 4, r % 4) entry.  A [C, 3, 3] layout tile-pads its minor dims
    # to one (8, 128) tile PER TET (~4 KB/row): at the 110k-node imported
    # mesh's 623k tets the four 3-D tensors held ~10 GB of HBM and the
    # full tick crashed the TPU worker (round-5).  Flat rows are dense.
    qinv: jax.Array  # f32[9, C]  rest-shape inverse (edge-matrix inverse)
    g: jax.Array  # f32[12, C]
    lo: jax.Array  # f32[C]  minStrain (strain) / minOmega (volume)
    hi: jax.Array  # f32[C]  maxStrain / maxOmega
    w: jax.Array  # f32[C]

    def qinv3(self) -> jax.Array:
        """Reconstructed ``[C, 3, 3]`` view (small-scene/diagnostic paths)."""
        return self.qinv.T.reshape(-1, 3, 3)

    def g3(self) -> jax.Array:
        """Reconstructed ``[C, 3, 4]`` view (small-scene/diagnostic paths)."""
        return self.g.T.reshape(-1, 3, 4)


@jax.tree_util.register_dataclass
@dataclass
class BendBatch:
    """``BendConstraint`` batch (``Constraints.h:215-230``); A = B = I₄."""

    idx: jax.Array  # i32[C, 4]  (x1, x2, x3, x4); (x2,x3) is the shared edge
    rest_angle: jax.Array  # f32[C]
    w: jax.Array  # f32[C]


@jax.tree_util.register_dataclass
@dataclass
class ChainBatch:
    """Chain-structured distance constraints for the EXACT sequential PBD
    projection (``Constraints.h:121-129`` applied in emission order at
    ``Solver.cpp:65-67``).

    When every distance constraint writes a unique node (asymmetric
    projection: only ``idx0`` moves, ``Constraints.cpp:34``), consecutive
    constraints chase each other (``idx1[j] == idx0[j-1]``), and no chain's
    anchor (its first ``idx1``) is written by any constraint, the constraint
    set partitions into node-disjoint chains — ropes.  A ``lax.scan`` down
    the link axis with the carry holding the just-updated chase target then
    reproduces the reference's sequential projection bit-for-bit per chain,
    with all chains advancing in parallel (they share no nodes, so any
    interleaving equals emission order).  Chains are padded to the longest
    length with ``w = 0`` links (zero delta, scatter-add safe).
    """

    idx0: jax.Array  # i32[C, L] written node per link, in chain order
    anchor: jax.Array  # i32[C] chase root (never written)
    rest: jax.Array  # f32[C, L]
    w: jax.Array  # f32[C, L] (0 on padding links)


@jax.tree_util.register_dataclass
@dataclass
class GroupBatch:
    """Flat ragged-group storage shared by ``ShapeMatchingConstraint`` and
    ``GoalMatchingConstraint`` (``ShapeMatchingConstraint.h:15-60``).

    Ragged node groups become a flat membership list plus ``segment_sum``
    reductions keyed by ``group_idx`` — the deterministic TPU replacement for
    the reference's per-group accumulation loops
    (``ShapeMatchingConstraint.cpp:96-122``).
    """

    node_idx: jax.Array  # i32[M]   member -> node
    group_idx: jax.Array  # i32[M]   member -> group
    mat_coords: jax.Array  # f32[M,3] material coords (centered for shape,
    #                                  raw initial positions for goal)
    member_mask: jax.Array  # f32[M]
    w: jax.Array  # f32[G]
    group_mask: jax.Array  # f32[G]
    inv_count: jax.Array  # f32[G]  1 / member count (COM weight)
    qinv: jax.Array  # f32[G,3,3]  (shape only; identity for goal)
    transforms: jax.Array  # f32[G,4,4] (goal only; identity for shape)

    @property
    def num_groups(self) -> int:
        return self.w.shape[0]


@jax.tree_util.register_dataclass
@dataclass
class Topology:
    distance: DistanceBatch
    position: PositionBatch
    strain: TetBatch
    volume: TetBatch
    bend: BendBatch
    shape: GroupBatch
    goal: GroupBatch
    triangles: jax.Array  # i32[T, 3] surface triangles (collision + render)
    tri_mask: jax.Array  # f32[T]
    # Collision bodies: groups of *contiguous* triangles that pairwise share
    # nodes (e.g. the 4 faces of one tet) never collide among themselves, so
    # the broadphase inserts/gathers one representative per body and expands
    # candidates arithmetically.  rep_mask marks each body's first triangle;
    # body_count (at the representative) is the body's triangle count.
    tri_rep_mask: jax.Array  # f32[T]
    tri_body_count: jax.Array  # i32[T]
    tets: jax.Array  # i32[K, 4] (kept for parity with Solver.h:155; unused
    #                              at runtime, like the reference's tet hash)
    tet_mask: jax.Array  # f32[K]
    # Constant part of the PD system diagonal: Σ w·(AᵀA)ᵢᵢ over all static
    # constraints, scattered per node (Solver.cpp:179-210 minus the mass term,
    # which depends on the dynamic dt).
    stiffness_diag: jax.Array  # f32[N]
    # Banded form of the strain+volume AᵀA blocks for element-major scenes
    # (idx exactly arange): the combined operator is a block-diagonal matrix
    # of 4x4 blocks = a banded matrix of half-bandwidth 3, stored as 7
    # diagonals over the node axis.  One CG application is then 7 shifted
    # fused multiply-adds on [N, 3] — no gathers, no [C,4,3] intermediates
    # (XLA tile-pads trailing (4,3) dims ~40x, the measured matvec cost).
    # Zeros outside the tet node range; empty ([7, 1]) when not applicable.
    tet_band: jax.Array  # f32[7, N] or f32[7, 1]
    # Per-node floor-contact multiplicity: how many (live triangle, corner)
    # entries reference each node.  The PD sweep emits one
    # StaticCollisionConstraint per such entry (Solver.cpp:829-834); since
    # all entries of a node share its y test and projection, their combined
    # effect is exactly count · (per-entry term) — a dense elementwise
    # multiply instead of a T·3-row scatter in every force/diag/stabilize
    # pass (the measured hot spot at stress scale).
    floor_count: jax.Array  # f32[N]
    # Small-scene prefactorization (the TPU-native analog of the reference's
    # SimplicialLLT prefactorization, Solver.cpp:212-215): the dense
    # constraint operator Σ w·AᵀA as one [N, N] matrix, and the inverse of
    # (M/h² + Σ w·AᵀA) used as the CG preconditioner.  With the exact
    # inverse of the collision-free system, CG converges in ONE trip on
    # contact-free substeps and 2-3 with contacts — tiny scenes are bound by
    # while-loop trip overhead (~50 µs/trip), not FLOPs, and a [N≤1k, N]
    # matmul is ~free on the MXU.  [1, 1] placeholders when disabled
    # (host._prepare fills them for capacities ≤ dense_operator_max).
    ata_dense: jax.Array  # f32[N, N] or f32[1, 1]
    inv_dense: jax.Array  # f32[N, N] or f32[1, 1]
    # Static position-pin force Σ w·target folded per node (targets are
    # build-time constants, Constraints.cpp:65-74): ONE dense add replaces
    # the per-PD-iteration scatter.  [1, 3] placeholder when no pins.
    position_force_dense: jax.Array = None  # f32[N, 3] or f32[1, 3]
    # Small-scene dense distance incidence (+1 at idx[:,1], −1 at idx[:,0]
    # per constraint row): the local-step gather and the force scatter
    # become two MXU matmuls (built by host._prepare alongside ata_dense
    # for capacities <= dense_operator_max).  [1, 1] placeholder otherwise.
    dist_dense: jax.Array = None  # f32[C, N] or f32[1, 1]
    # Disjoint-tet block structure: when the banded layout holds (strain/
    # volume idx exactly arange — tets contiguous AND node-disjoint) and no
    # distance constraints exist, every OFF-diagonal static operator term
    # lives inside a 4x4 block (bend/shape/goal/position/contact terms are
    # all diagonal in this PD formulation, Constraints.cpp:390-391,
    # ShapeMatchingConstraint.cpp:50-56, CollisionConstraint.cpp:42-46).
    # The global solve is then EXACT per block: a batched 4x4 Cholesky
    # (assembly.tet_block_factor/apply) preconditions CG to ONE trip — the
    # large-scene analog of the reference's SimplicialLLT prefactorization
    # (Solver.cpp:212-215), refactored per substep like Solver.cpp:260-262
    # but in O(N) instead of O(nnz^1.5).  Rows are the 6 upper off-diagonal
    # block entries (0,1),(0,2),(0,3),(1,2),(1,3),(2,3) per block; None
    # when the structure doesn't hold.
    tet_block6: jax.Array = None  # f32[6, N//4] or None
    # Super-body broadphase corner table (collision/broadphase.
    # _detect_point_tri_super): node ids of every collision super-body's
    # corner slots — packed bodies (a uniform contiguous-node prefix)
    # followed by one body per leftover triangle, loose rows padded to the
    # corner width by repeating corner 0 (duplicates never extend AABBs and
    # are masked out of the combo space).  None when the super path is off.
    super_corners: jax.Array = None  # i32[K, W] or None
    # Static shared-node adjacency for the super path: body ids whose node
    # sets intersect this row's (excluding itself), -1 padded.  The
    # reference skips shared-node triangle pairs at sweep time
    # (Solver.cpp:757-770); here the exclusion is static topology, dropped
    # at candidate-gather time so mesh-adjacent pairs never reach the
    # narrow buffer (they would otherwise pin it full — cloth neighbors'
    # AABBs always overlap).  None when no two bodies share a node.
    super_adj: jax.Array = None  # i32[K, A] or None
    # Assembled ELL (padded row-sparse) form of the strain+volume AᵀA for
    # SHARED-NODE tet meshes — the reference's flagship addTriMeshVolume
    # path (PrimitiveUtilities.cpp:164-328).  The matrix-free gather/
    # scatter apply is O(C)-shaped: at the 110k-node imported mesh's 623k
    # tets one CG trip moved ~2.5 GB of tile-padded tet rows (90 ms/trip).
    # The assembled N-row form stores each node's ~15-30 neighbor
    # coefficients; one apply is M row-gathers + fused multiply-adds on
    # [N, 3] (~60x less traffic).  Built whenever tets are present, the
    # element-major banded form does NOT hold, and the max row degree is
    # bounded; None otherwise (disjoint soups use tet_band/tet_block6).
    ell_nbr: jax.Array = None  # i32[N, M] or None
    ell_coef: jax.Array = None  # f32[N, M] or None
    # Chain-structured distance constraints (PBD exact sequential
    # projection); None unless the host detected the chain layout and the
    # solver is PBD.  See ChainBatch.
    chains: ChainBatch = None


# ---------------------------------------------------------------------------
# Host-side builders (NumPy, scene-construction time)
# ---------------------------------------------------------------------------


def build_distance(
    idx: np.ndarray, positions: np.ndarray, w: np.ndarray, cap: int | None = None
) -> DistanceBatch:
    """Rest lengths from initial positions (``Constraints.cpp:49-55``)."""
    idx = np.asarray(idx, dtype=_I32).reshape(-1, 2)
    w = np.broadcast_to(np.asarray(w, dtype=_F32), (idx.shape[0],)).copy()
    rest = np.linalg.norm(
        positions[idx[:, 1]] - positions[idx[:, 0]], axis=-1
    ).astype(_F32)
    cap = cap or _round_up(idx.shape[0], 8)
    return DistanceBatch(
        idx=np.asarray(_pad2(idx, cap)),
        rest=np.asarray(_pad2(rest, cap)),
        w=np.asarray(_pad2(w, cap)),
    )


def build_position(
    idx: np.ndarray, positions: np.ndarray, w: np.ndarray, cap: int | None = None
) -> PositionBatch:
    """Targets captured from initial positions (``Constraints.cpp:65-74``)."""
    idx = np.asarray(idx, dtype=_I32).reshape(-1)
    w = np.broadcast_to(np.asarray(w, dtype=_F32), (idx.shape[0],)).copy()
    target = positions[idx].astype(_F32)
    cap = cap or _round_up(idx.shape[0], 8)
    return PositionBatch(
        idx=np.asarray(_pad2(idx, cap)),
        target=np.asarray(_pad2(target, cap)),
        w=np.asarray(_pad2(w, cap)),
    )


def _tet_rest(idx: np.ndarray, positions: np.ndarray):
    """Rest-shape matrices shared by strain/volume tets.

    ``Q`` columns are the rest edges (``baryToDiff``, ``Constraints.cpp:151``);
    ``G = Qinvᵀ · W`` with ``W = [[-1,1,0,0],[-1,0,1,0],[-1,0,0,1]]`` so that
    per axis ``G · (x₁..x₄) = row of F`` (``Constraints.cpp:141-175``).
    """
    p = positions[idx]  # [C,4,3]
    q = np.stack(
        [p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]], axis=-1
    ).astype(np.float64)  # [C,3,3] columns = edges
    qinv = np.linalg.inv(q)
    west = np.array(
        [[-1, 1, 0, 0], [-1, 0, 1, 0], [-1, 0, 0, 1]], dtype=np.float64
    )
    g = np.einsum("cji,jk->cik", qinv, west)  # Qinvᵀ · W  -> [C,3,4]
    return qinv.astype(_F32), g.astype(_F32)


def build_tets(
    idx: np.ndarray,
    positions: np.ndarray,
    w: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    cap: int | None = None,
) -> TetBatch:
    idx = np.asarray(idx, dtype=_I32).reshape(-1, 4)
    n = idx.shape[0]
    w = np.broadcast_to(np.asarray(w, dtype=_F32), (n,)).copy()
    lo = np.broadcast_to(np.asarray(lo, dtype=_F32), (n,)).copy()
    hi = np.broadcast_to(np.asarray(hi, dtype=_F32), (n,)).copy()
    if n:
        qinv, g = _tet_rest(idx, positions)
    else:
        qinv = np.zeros((0, 3, 3), _F32)
        g = np.zeros((0, 3, 4), _F32)
    cap = cap or _round_up(n, 8)
    pad_qinv = _pad2(qinv, cap)
    pad_g = _pad2(g, cap)
    return TetBatch(
        idx=np.asarray(_pad2(idx, cap)),
        qinv=np.ascontiguousarray(pad_qinv.reshape(cap, 9).T),
        g=np.ascontiguousarray(pad_g.reshape(cap, 12).T),
        lo=np.asarray(_pad2(lo, cap)),
        hi=np.asarray(_pad2(hi, cap)),
        w=np.asarray(_pad2(w, cap)),
    )


def build_bend(
    idx: np.ndarray, positions: np.ndarray, w: np.ndarray, cap: int | None = None
) -> BendBatch:
    """Rest dihedral angle from initial configuration (``Constraints.cpp:368-394``)."""
    idx = np.asarray(idx, dtype=_I32).reshape(-1, 4)
    n = idx.shape[0]
    w = np.broadcast_to(np.asarray(w, dtype=_F32), (n,)).copy()
    if n:
        p = positions[idx].astype(np.float64)
        p2, p3, p4 = p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]
        n1 = np.cross(p2, p3)
        n2 = np.cross(p2, p4)
        n1 /= np.maximum(np.linalg.norm(n1, axis=-1, keepdims=True), 1e-30)
        n2 /= np.maximum(np.linalg.norm(n2, axis=-1, keepdims=True), 1e-30)
        d = np.clip(np.sum(n1 * n2, axis=-1), -1.0, 1.0)
        rest = np.arccos(d).astype(_F32)
    else:
        rest = np.zeros((0,), _F32)
    cap = cap or _round_up(n, 8)
    return BendBatch(
        idx=np.asarray(_pad2(idx, cap)),
        rest_angle=np.asarray(_pad2(rest, cap)),
        w=np.asarray(_pad2(w, cap)),
    )


def build_groups(
    groups: list[tuple[np.ndarray, np.ndarray]],  # [(node_ids, mat_coords)]
    weights: np.ndarray,
    inv_mass: np.ndarray,
    *,
    kind: str,  # "shape" | "goal"
    member_cap: int | None = None,
    group_cap: int | None = None,
) -> GroupBatch:
    """Flatten ragged shape/goal groups into segment-reduction form.

    For ``kind="shape"`` this performs the constructor precompute of
    ``ShapeMatchingConstraint`` (``ShapeMatchingConstraint.cpp:6-48``):
    equal-weight COM of material coords, centering, and the mass-weighted
    moment matrix ``Q = Σ m·(x₀−com₀)(x₀−com₀)ᵀ`` whose inverse seeds the
    deformation gradient.  For ``kind="goal"`` the raw initial positions are
    stored (``ShapeMatchingConstraint.cpp:124-137``).
    """
    num_groups = len(groups)
    weights = np.broadcast_to(np.asarray(weights, dtype=_F32), (num_groups,)).copy()
    node_idx, group_idx, mats = [], [], []
    inv_counts = np.zeros(num_groups, dtype=_F32)
    qinvs = np.tile(np.eye(3, dtype=_F32), (num_groups, 1, 1))
    for gi, (ids, coords) in enumerate(groups):
        ids = np.asarray(ids, dtype=_I32).reshape(-1)
        coords = np.asarray(coords, dtype=np.float64).reshape(-1, 3)
        count = ids.shape[0]
        inv_counts[gi] = 1.0 / max(count, 1)
        if kind == "shape":
            com = coords.mean(axis=0)
            local = coords - com
            m = np.zeros(count)
            im = np.asarray(inv_mass, dtype=np.float64)[ids]
            m = np.where(im > 0, 1.0 / np.maximum(im, 1e-30), 0.0)
            q = np.einsum("mi,mj,m->ij", local, local, m)
            # Pseudo-inverse: planar groups (e.g. the reference's own flat
            # 50x50 shape-matching sheet, PrimitiveUtilities.cpp:1050-1125)
            # have an exactly singular moment matrix, which the reference
            # hands to Eigen's inverse() undefined; pinv degrades gracefully
            # and equals inv() for full-rank groups.
            qinvs[gi] = np.linalg.pinv(q).astype(_F32)
            mats.append(local.astype(_F32))
        else:
            mats.append(coords.astype(_F32))
        node_idx.append(ids)
        group_idx.append(np.full(count, gi, dtype=_I32))

    node_idx = np.concatenate(node_idx) if node_idx else np.zeros(0, _I32)
    group_idx = np.concatenate(group_idx) if group_idx else np.zeros(0, _I32)
    mats = np.concatenate(mats) if mats else np.zeros((0, 3), _F32)

    m_cap = member_cap or _round_up(node_idx.shape[0], 8)
    g_cap = group_cap or max(1, _round_up(num_groups, 1))
    transforms = np.tile(np.eye(4, dtype=_F32), (g_cap, 1, 1))
    return GroupBatch(
        node_idx=np.asarray(_pad2(node_idx, m_cap)),
        group_idx=np.asarray(_pad2(group_idx, m_cap, fill=max(0, g_cap - 1))),
        mat_coords=np.asarray(_pad2(mats, m_cap)),
        member_mask=np.asarray(
            _pad2(np.ones(node_idx.shape[0], _F32), m_cap)
        ),
        w=np.asarray(_pad2(weights, g_cap)),
        group_mask=np.asarray(_pad2(np.ones(num_groups, _F32), g_cap)),
        inv_count=np.asarray(_pad2(inv_counts, g_cap, fill=1)),
        qinv=np.asarray(_pad2(qinvs, g_cap)),
        transforms=np.asarray(transforms),
    )


def empty_topology_like_fields(num_nodes: int):
    """Empty (all-padding) batches for constraint types a scene doesn't use."""
    zero3 = np.zeros((0, 3), _F32)
    return dict(
        distance=build_distance(np.zeros((0, 2), _I32), zero3, np.zeros(0, _F32)),
        position=build_position(np.zeros(0, _I32), zero3, np.zeros(0, _F32)),
        strain=build_tets(
            np.zeros((0, 4), _I32), zero3, np.zeros(0, _F32), 0.8, 1.0
        ),
        volume=build_tets(
            np.zeros((0, 4), _I32), zero3, np.zeros(0, _F32), 1.0, 1.0
        ),
        bend=build_bend(np.zeros((0, 4), _I32), zero3, np.zeros(0, _F32)),
        shape=build_groups([], np.zeros(0, _F32), np.ones(num_nodes), kind="shape"),
        goal=build_groups([], np.zeros(0, _F32), np.ones(num_nodes), kind="goal"),
    )


def assemble_topology(
    num_nodes: int,
    *,
    triangles: np.ndarray | None = None,
    tets: np.ndarray | None = None,
    tri_cap: int | None = None,
    tri_bodies: np.ndarray | None = None,  # i32[T] body id per tri, or None
    **batches,
) -> Topology:
    """Combine built batches, fill in empties, and precompute the constant
    stiffness diagonal + PBD projection counts."""
    fields = empty_topology_like_fields(num_nodes)
    fields.update(batches)

    tris = (
        np.asarray(triangles, dtype=_I32).reshape(-1, 3)
        if triangles is not None
        else np.zeros((0, 3), _I32)
    )
    tcap = tri_cap or _round_up(tris.shape[0], 8)

    nt = tris.shape[0]
    if tri_bodies is None:
        rep = np.ones(nt, _F32)
        body_count = np.ones(nt, _I32)
    else:
        tri_bodies = np.asarray(tri_bodies, _I32).reshape(-1)
        assert tri_bodies.shape[0] == nt
        rep = np.zeros(nt, _F32)
        body_count = np.ones(nt, _I32)
        if nt:
            first = np.concatenate([[True], tri_bodies[1:] != tri_bodies[:-1]])
            # bodies must be contiguous runs
            starts = np.nonzero(first)[0]
            ends = np.concatenate([starts[1:], [nt]])
            rep[starts] = 1.0
            body_count[starts] = (ends - starts).astype(_I32)
    tetarr = (
        np.asarray(tets, dtype=_I32).reshape(-1, 4)
        if tets is not None
        else np.zeros((0, 4), _I32)
    )
    kcap = _round_up(tetarr.shape[0], 8)

    diag = np.zeros(num_nodes, dtype=np.float64)

    d: DistanceBatch = fields["distance"]
    di, dw = np.asarray(d.idx), np.asarray(d.w)
    # Distance AᵀA = A has 0.5 on the diagonal (Constraints.cpp:42-47).
    np.add.at(diag, di[:, 0], 0.5 * dw)
    np.add.at(diag, di[:, 1], 0.5 * dw)

    p: PositionBatch = fields["position"]
    np.add.at(diag, np.asarray(p.idx), np.asarray(p.w))

    for key in ("strain", "volume"):
        t: TetBatch = fields[key]
        ti, tw = np.asarray(t.idx), np.asarray(t.w)
        # t.g is [12, C] flat (row 4j+a); (AᵀA)ᵢᵢ = Σⱼ G²ⱼᵢ
        tg = np.asarray(t.g).T.reshape(-1, 3, 4)
        ata_diag = np.einsum("cji,cji->ci", tg, tg)
        for k in range(4):
            np.add.at(diag, ti[:, k], tw * ata_diag[:, k])

    b: BendBatch = fields["bend"]
    bi, bw = np.asarray(b.idx), np.asarray(b.w)
    for k in range(4):  # A = I₄ (Constraints.cpp:390-391)
        np.add.at(diag, bi[:, k], bw)

    for key in ("shape", "goal"):
        grp: GroupBatch = fields[key]
        gw = np.asarray(grp.w)[np.asarray(grp.group_idx)] * np.asarray(
            grp.member_mask
        )
        # A = B = I ⇒ +w on each member diagonal
        # (ShapeMatchingConstraint.cpp:50-56,139-145)
        np.add.at(diag, np.asarray(grp.node_idx), gw)

    floor_count = np.zeros(num_nodes, dtype=_F32)
    if nt:
        np.add.at(floor_count, tris.reshape(-1), 1.0)

    # Banded strain+volume operator for element-major layouts: live rows
    # must index nodes exactly as arange (padding rows have w = 0 and
    # contribute zeros wherever they point).
    banded = num_nodes > 0
    for key in ("strain", "volume"):
        t: TetBatch = fields[key]
        ti, tw = np.asarray(t.idx), np.asarray(t.w)
        live_rows = ti[tw > 0]
        if live_rows.size and not np.array_equal(
            live_rows.reshape(-1), np.arange(live_rows.size, dtype=np.int64)
        ):
            banded = False
    if banded:
        tet_band = np.zeros((7, num_nodes), dtype=_F32)
        for key in ("strain", "volume"):
            t = fields[key]
            ti, tw = np.asarray(t.idx), np.asarray(t.w)
            tg = np.asarray(t.g).T.reshape(-1, 3, 4)
            gtg = np.einsum("cja,cjb->cab", tg, tg) * tw[:, None, None]
            for a in range(4):
                for b_ in range(4):
                    np.add.at(
                        tet_band[3 + b_ - a], ti[:, a], gtg[:, a, b_]
                    )
    else:
        tet_band = np.zeros((7, 1), dtype=_F32)

    # Disjoint-tet 4x4 block off-diagonals (see the Topology.tet_block6
    # comment): derivable from the band because banded layouts are exactly
    # the node-disjoint contiguous-tet layouts — B[a][b] of block k is
    # band[3 + b - a][4k + a].  Blocks past the live tets (capacity padding,
    # non-tet nodes) have zero off-diagonals, i.e. a plain diagonal solve.
    if banded and num_nodes % 4 == 0 and di.shape[0] == 0:
        tet_block6 = np.stack(
            [
                tet_band[3 + b_ - a].reshape(-1, 4)[:, a]
                for a, b_ in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
            ]
        )
    else:
        tet_block6 = None

    # Assembled ELL operator for shared-node tet meshes (see the field
    # comment).  Coefficients are coalesced in f64 on the host (the same
    # assembly the reference does into its Eigen sparse matrix,
    # Solver.cpp:184-210) — done once per topology change.
    ell_nbr = ell_coef = None
    if not banded:
        rows_l, cols_l, vals_l = [], [], []
        for key in ("strain", "volume"):
            t = fields[key]
            ti, tw = np.asarray(t.idx), np.asarray(t.w)
            live = tw > 0
            if not np.any(live):
                continue
            ti, tw = ti[live], tw[live]
            tg = np.asarray(t.g).T.reshape(-1, 3, 4)[live]
            gtg = np.einsum("cja,cjb->cab", tg, tg) * tw[:, None, None]
            for a in range(4):
                for b_ in range(4):
                    rows_l.append(ti[:, a])
                    cols_l.append(ti[:, b_])
                    vals_l.append(gtg[:, a, b_])
        if rows_l:
            r = np.concatenate(rows_l).astype(np.int64)
            c_ = np.concatenate(cols_l).astype(np.int64)
            v = np.concatenate(vals_l).astype(np.float64)
            key64 = r * num_nodes + c_
            uniq, inv = np.unique(key64, return_inverse=True)
            coal = np.zeros(uniq.shape[0], np.float64)
            np.add.at(coal, inv, v)
            rr = uniq // num_nodes
            cc = uniq % num_nodes
            deg = np.bincount(rr, minlength=num_nodes)
            m = int(deg.max()) if deg.size else 0
            if 0 < m <= 64:
                starts = np.zeros(num_nodes + 1, np.int64)
                np.cumsum(deg, out=starts[1:])
                slot = np.arange(uniq.shape[0], dtype=np.int64) - starts[rr]
                nbr = np.zeros((num_nodes, m), _I32)
                coef = np.zeros((num_nodes, m), _F32)
                nbr[rr, slot] = cc.astype(_I32)
                coef[rr, slot] = coal.astype(_F32)
                ell_nbr, ell_coef = nbr, coef

    # Static position-pin forces folded per node: targets never change after
    # build, so Σ w·target is a constant dense array added once per PD
    # iteration instead of scattered (Constraints.cpp:65-74).
    if np.asarray(p.idx).shape[0]:
        pos_force = np.zeros((num_nodes, 3), np.float64)
        np.add.at(
            pos_force,
            np.asarray(p.idx),
            np.asarray(p.w)[:, None].astype(np.float64)
            * np.asarray(p.target, np.float64),
        )
        pos_force = pos_force.astype(_F32)
    else:
        pos_force = np.zeros((1, 3), _F32)

    return Topology(
        triangles=np.asarray(_pad2(tris, tcap)),
        tri_mask=np.asarray(_pad2(np.ones(tris.shape[0], _F32), tcap)),
        tri_rep_mask=np.asarray(_pad2(rep, tcap)),
        tri_body_count=np.asarray(_pad2(body_count, tcap, fill=1)),
        tets=np.asarray(_pad2(tetarr, kcap)),
        tet_mask=np.asarray(_pad2(np.ones(tetarr.shape[0], _F32), kcap)),
        stiffness_diag=np.asarray(diag.astype(_F32)),
        tet_band=np.asarray(tet_band),
        floor_count=np.asarray(floor_count),
        ata_dense=np.zeros((1, 1), _F32),
        inv_dense=np.zeros((1, 1), _F32),
        position_force_dense=pos_force,
        dist_dense=np.zeros((1, 1), _F32),
        tet_block6=tet_block6,
        ell_nbr=ell_nbr,
        ell_coef=ell_coef,
        **fields,
    )
