"""Host-facing ``Solver`` — the drop-in analog of ``Pies::Solver``.

Mirrors the reference's public surface (``Solver.h:40-116``): construction
from ``SolverOptions``, ``tick``, ``clear``, the scene-building methods, the
render-facing getters (``getVertices``/``getLines``/``getTriangles`` +
``renderStateDirty``), and the ``releaseHinge`` toggle.  On top of that it
adds what the reference lacks (SURVEY §5): checkpoint/resume, per-tick
timing/residual metrics, and deterministic stepping.

Architecture: scene methods mutate a host-side ``SceneBuilder`` (NumPy);
the first tick after a topology change pads + uploads device batches and
(re)compiles the step — the analog of the reference's lazy re-precompute on
node-count change (``Solver.cpp:168-221``).  Every subsequent tick is one
compiled XLA program launch with no host round-trips.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import topology as topo_mod
from ..options import (
    CollisionBudget,
    SolverOptions,
    StepConfig,
    make_params,
)
from ..scene.builder import SceneBuilder
from ..state import (
    SolverState,
    empty_broadphase_cache,
    empty_node_pair_cache,
    load_state,
    make_state,
    save_state,
)
from .step import tick as tick_fn
from .step import tick_n as tick_n_fn

_F32 = np.float32


def _round_up8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


def _detect_chains(idx: np.ndarray, rest: np.ndarray, w: np.ndarray):
    """Partition distance constraints into chase chains (see
    ``topology.ChainBatch``): split at every ``idx1[j] != idx0[j-1]``;
    valid iff all written nodes (``idx0``) are globally unique and no
    chain anchor is ever written.  Returns ``(idx0 [C, L], anchor [C],
    rest [C, L], w [C, L])`` padded arrays or None."""
    n = idx.shape[0]
    if n == 0:
        return None
    if np.unique(idx[:, 0]).size != n:
        return None
    brk = np.concatenate([[True], idx[1:, 1] != idx[:-1, 0]])
    starts = np.nonzero(brk)[0]
    ends = np.concatenate([starts[1:], [n]])
    anchors = idx[starts, 1]
    if np.intersect1d(anchors, idx[:, 0]).size:
        return None
    c = starts.shape[0]
    lmax = int((ends - starts).max())
    idx0 = np.zeros((c, lmax), np.int32)
    rest_t = np.zeros((c, lmax), np.float32)
    w_t = np.zeros((c, lmax), np.float32)  # padding links stay w=0
    for ci, (s0, e0) in enumerate(zip(starts, ends)):
        ln = e0 - s0
        idx0[ci, :ln] = idx[s0:e0, 0]
        rest_t[ci, :ln] = rest[s0:e0]
        w_t[ci, :ln] = w[s0:e0]
    return idx0, anchors.astype(np.int32), rest_t, w_t


def _color_distance(idx: np.ndarray, max_colors: int = 63):
    """Greedy first-fit coloring of distance constraints: two constraints
    conflict when they share ANY node (covers both write-write on idx0 and
    write-read between idx0/idx1 under the asymmetric projection,
    ``Constraints.cpp:29-36``).  Emission order first-fit gives 2 colors on
    chains and ~node-degree colors on lattices.

    Returns ``(perm, ends)`` — a stable permutation grouping constraints by
    color and the cumulative end offset of each color class — or ``None``
    if more than ``max_colors`` colors would be needed (fall back to
    Jacobi).
    """
    n_c = idx.shape[0]
    used = {}  # node -> bitmask of colors touching it
    colors = np.empty(n_c, np.int32)
    for i in range(n_c):
        a, b = int(idx[i, 0]), int(idx[i, 1])
        taken = used.get(a, 0) | used.get(b, 0)
        c = (~taken & (taken + 1)).bit_length() - 1  # lowest zero bit
        if c >= max_colors:
            return None
        colors[i] = c
        bit = 1 << c
        used[a] = used.get(a, 0) | bit
        used[b] = used.get(b, 0) | bit
    perm = np.argsort(colors, kind="stable")
    counts = np.bincount(colors)
    ends = tuple(int(v) for v in np.cumsum(counts))
    return perm, ends


def _detect_super_layout(tris: np.ndarray, bodies: np.ndarray, cap: int):
    """Detect the super-body collision layout for a general triangle scene
    (see ``StepConfig.super_*`` and ``broadphase._detect_point_tri_super``).

    * Multi-triangle bodies (``tri_bodies`` runs longer than 1) must ALL
      share one uniform packed structure — ``e`` triangles over ``m``
      contiguous nodes at ``off + i*m`` with one local corner pattern
      (exactly the packed-body precondition, but only over the multi-tri
      subset).  If they don't, the whole attempt bails (returns None) and
      detection stays on the per-triangle paths.
    * Every single-triangle body becomes one loose row with explicit corner
      ids.
    * The static shared-node adjacency (every pair of bodies whose node sets
      intersect — the reference's sweep-time skip, ``Solver.cpp:757-770``) is
      enumerated once here; a node shared by pathologically many bodies
      (> 64) bails rather than truncate, since dropping an exclusion would
      create contacts between glued geometry.

    Returns ``(config_fields, corners i32[K, W], adj i32[K, A] | None)`` or
    ``None`` when the layout doesn't apply.
    """
    nt = tris.shape[0]
    if nt == 0:
        return None
    first = np.concatenate([[True], bodies[1:] != bodies[:-1]])
    starts = np.nonzero(first)[0]
    ends = np.concatenate([starts[1:], [nt]])
    counts = (ends - starts).astype(np.int64)
    multi = counts > 1
    kp = int(multi.sum())
    m, off = 0, 0
    pat_list: list[tuple[int, int, int]] = []
    if kp:
        e = int(counts[multi][0])
        if not np.all(counts[multi] == e):
            return None
        rows = (starts[multi][:, None] + np.arange(e)[None, :]).reshape(-1)
        tn = tris[rows].reshape(kp, e * 3)
        mins = tn.min(axis=1)
        m = int(tn[0].max() - mins[0] + 1)
        local = tris[rows].reshape(kp, e, 3) - mins[:, None, None]
        if not (
            3 <= m <= 8
            and np.all(tn.max(axis=1) - mins + 1 == m)
            and np.array_equal(
                mins, mins[0] + np.arange(kp, dtype=mins.dtype) * m
            )
            and np.all(local == local[0])
        ):
            return None
        off = int(mins[0])
        if off + kp * m > cap:
            return None
        pat_list = [tuple(int(v) for v in r) for r in local[0]]
    e_packed = len(pat_list)
    loose_tris = tris[np.repeat(~multi, counts)]
    tl = loose_tris.shape[0]
    loose_face = -1
    if tl:
        loose_face = (
            pat_list.index((0, 1, 2)) if (0, 1, 2) in pat_list
            else len(pat_list)
        )
        if loose_face == len(pat_list):
            pat_list.append((0, 1, 2))
    w_c = m if kp else 3
    if w_c * len(pat_list) > 32:
        return None
    live_k = kp + tl
    k = _round_up8(live_k)
    corners = np.zeros((k, w_c), np.int32)
    if kp:
        corners[:kp] = off + (
            np.arange(kp, dtype=np.int32)[:, None] * m
            + np.arange(m, dtype=np.int32)[None, :]
        )
    if tl:
        corners[kp : kp + tl, :3] = loose_tris
        if w_c > 3:  # pad by repeating corner 0 (masked out of combos)
            corners[kp : kp + tl, 3:] = loose_tris[:, :1]

    # Shared-node adjacency: (node, row) incidence -> per-node row groups ->
    # all ordered intra-group pairs -> per-row neighbor table.
    inc = np.unique(
        np.stack(
            [
                corners[:live_k].reshape(-1).astype(np.int64),
                np.repeat(np.arange(live_k, dtype=np.int64), w_c),
            ],
            axis=1,
        ),
        axis=0,
    )
    node_ids, row_ids = inc[:, 0], inc[:, 1]
    uniq, idx_start, g_counts = np.unique(
        node_ids, return_index=True, return_counts=True
    )
    adj = None
    gmax = int(g_counts.max()) if g_counts.size else 0
    if gmax > 64:
        return None
    if gmax > 1:
        tab = np.full((uniq.size, gmax), -1, np.int64)
        pos = np.arange(inc.shape[0]) - np.repeat(idx_start, g_counts)
        tab[np.repeat(np.arange(uniq.size), g_counts), pos] = row_ids
        prs = []
        for a in range(gmax):
            va = tab[:, a]
            for bb in range(gmax):
                if a == bb:
                    continue
                vb = tab[:, bb]
                ok = (va >= 0) & (vb >= 0)
                if ok.any():
                    prs.append(np.stack([va[ok], vb[ok]], axis=1))
        if prs:
            allp = np.unique(np.concatenate(prs), axis=0)
            r1, r2 = allp[:, 0], allp[:, 1]
            uu, st, cc = np.unique(r1, return_index=True, return_counts=True)
            a_width = int(cc.max())
            if a_width > 64:
                return None
            adj = np.full((k, a_width), -1, np.int32)
            pos = np.arange(allp.shape[0]) - np.repeat(st, cc)
            adj[r1, pos] = r2.astype(np.int32)

    fields = dict(
        super_k=k,
        super_packed_k=kp,
        super_packed_m=m,
        super_packed_off=off,
        super_live_k=live_k,
        super_faces=tuple(pat_list),
        super_packed_e=e_packed,
        super_loose_face=loose_face,
    )
    return fields, corners, adj


class Solver:
    def __init__(
        self,
        options: SolverOptions | None = None,
        *,
        seed: int = 0,
        cg_iterations: int = 16,
        # Early-exit tolerance for the CG global step (relative to the
        # initial preconditioned residual).  The PD outer loop warm-starts
        # CG from the current positions, so converged scenes exit in a few
        # trips instead of paying the full 16; 1e-4 measured
        # trajectory-identical to the fixed trip count at f32 (see
        # tests/test_solver.py::test_cg_rtol_early_exit_matches_fixed) —
        # 0.0 restores the fixed-trip form.
        cg_rtol: float = 1e-4,
        rotation_iterations: int = 20,
        enable_collisions: bool = True,
        enable_edge_collisions: bool = False,
        enable_node_collisions: bool = False,
        reference_quirks: bool = True,
        broadphase_mode: str = "celllist",
        # "recentered" has the identical fixed point to "full" (see
        # options.StepConfig.contact_coupling) and keeps the point-triangle
        # AtA block out of the CG operator: with full coupling that block
        # alone measured 11 ms x 64 applies/substep at 500k (the single
        # largest cost in the tick trace).
        contact_coupling: str = "recentered",
        budget: CollisionBudget | None = None,
        # Field overrides applied ON TOP of the scene-derived auto budget
        # (_auto_budget).  Unlike passing an explicit ``budget``, this keeps
        # the auto-sized per-cell/per-tri caps (an explicit budget leaves
        # them at defaults, silently dropping candidates in dense scenes).
        budget_overrides: dict | None = None,
        node_capacity: int | None = None,
        # Scenes up to this many (padded) triangles use the exact all-pairs
        # broadphase instead of the grid (StepConfig.allpairs_broadphase_max);
        # None keeps the StepConfig default.  Also the lower bound for
        # super-body layout detection (grid paths only pay off past it).
        allpairs_broadphase_max: int | None = None,
        # Scenes up to this capacity get the dense prefactorized operator +
        # inverse preconditioner (Topology.ata_dense/inv_dense): tiny ticks
        # are bound by per-op/while-trip overhead, and the [N, N] matmul
        # form converges CG in 1-3 trips (the reference's LLT structure,
        # Solver.cpp:212-215).  0 disables.  2048 covers the canonical
        # imported-mesh scene (1,331 nodes -> cap 1336): measured 60.7 ->
        # 5.85 ms/tick on the real chip (the generic path is pure per-op
        # overhead at this size); the one-time host-side f64 inversion at
        # 2048 is a few seconds, the [2048, 2048] matmul per CG trip ~80 us.
        dense_operator_max: int = 2048,
    ):
        self._options = options or SolverOptions()
        self._builder = SceneBuilder(seed=seed)
        self._cg_iterations = cg_iterations
        self._cg_rtol = cg_rtol
        self._rotation_iterations = rotation_iterations
        self._enable_collisions = enable_collisions
        self._enable_edge_collisions = enable_edge_collisions
        self._enable_node_collisions = enable_node_collisions
        self._reference_quirks = reference_quirks
        self._broadphase_mode = broadphase_mode
        self._allpairs_max = (
            StepConfig.allpairs_broadphase_max
            if allpairs_broadphase_max is None
            else allpairs_broadphase_max
        )
        self._contact_coupling = contact_coupling
        self._broadphase_cell = 1.0
        self._budget = budget
        self._budget_overrides = budget_overrides
        self._node_capacity = node_capacity
        self._dense_operator_max = dense_operator_max

        self._state: SolverState | None = None
        self._topology = None
        self._config: StepConfig | None = None
        self._prepared_nodes = 0
        self._dirty = True

        self.render_state_dirty = True
        self.release_hinge = False

        # Observability (the reference has none, SURVEY §5).
        self._residual_dev = None  # device-side CG residual of last tick
        self.last_tick_seconds: float = 0.0
        self.ticks: int = 0

    # ------------------------------------------------------------------
    # scene construction (delegates to SceneBuilder)
    # ------------------------------------------------------------------

    def _scene(self, fn, *args, **kwargs):
        out = fn(*args, **kwargs)
        self._dirty = True
        self.render_state_dirty = True
        return out

    def add_nodes(self, vertices):
        return self._scene(self._builder.add_nodes, vertices)

    def create_box(self, translation, scale, w):
        return self._scene(self._builder.create_box, translation, scale, w)

    def create_tet_box(
        self, translation, scale, initial_velocity, w, mass, hinged=False
    ):
        return self._scene(
            self._builder.create_tet_box,
            translation,
            scale,
            initial_velocity,
            w,
            mass,
            hinged,
        )

    def create_sheet(self, translation, scale, mass, w):
        return self._scene(self._builder.create_sheet, translation, scale, mass, w)

    def create_shape_matching_box(
        self, translation, count_x, count_y, count_z, scale, initial_velocity, w
    ):
        return self._scene(
            self._builder.create_shape_matching_box,
            translation,
            count_x,
            count_y,
            count_z,
            scale,
            initial_velocity,
            w,
        )

    def create_shape_matching_sheet(self, translation, scale, initial_velocity, w):
        return self._scene(
            self._builder.create_shape_matching_sheet,
            translation,
            scale,
            initial_velocity,
            w,
        )

    def create_bend_sheet(self, translation, scale, w):
        return self._scene(self._builder.create_bend_sheet, translation, scale, w)

    def create_rope(self, start, end, num_nodes, w, **kwargs):
        return self._scene(
            self._builder.create_rope, start, end, num_nodes, w, **kwargs
        )

    def create_tet_soup(self, count, spacing, scale, w, **kwargs):
        return self._scene(
            self._builder.create_tet_soup, count, spacing, scale, w, **kwargs
        )

    def add_fixed_regions(self, region_matrices, w):
        return self._scene(self._builder.add_fixed_regions, region_matrices, w)

    def add_linked_regions(self, region_matrices, w):
        return self._scene(self._builder.add_linked_regions, region_matrices, w)

    def add_tri_mesh_volume(
        self,
        vertices,
        tri_indices,
        initial_velocity=(0.0, 0.0, 0.0),
        density=1.0,
        strain_stiffness=1000.0,
        min_strain=0.8,
        max_strain=1.0,
        volume_stiffness=1000.0,
        compression=1.0,
        stretching=1.0,
        resolution=8,
        target_tets=None,
    ):
        """Tetrahedralize a closed triangle mesh and add it as a soft body —
        the ``addTriMeshVolume`` path (``PrimitiveUtilities.cpp:164-328``),
        with the native tet mesher replacing tetgen.  ``target_tets`` is the
        element budget (the analog of tetgen's max-volume switch the
        reference sizes imports with); when given it overrides
        ``resolution`` — see ``scene.tetmesh.tetrahedralize``."""
        from ..scene.tetmesh import tetrahedralize

        points, tets, surface = tetrahedralize(
            np.asarray(vertices, _F32), np.asarray(tri_indices, np.int32),
            resolution=resolution, target_tets=target_tets,
        )
        b = self._builder
        node_ids = b._emit_nodes(
            points, velocity=initial_velocity, inv_mass=1.0 / density, radius=0.5
        )
        b._emit_tets(
            node_ids[tets],
            0.0,
            strain=(min_strain, max_strain),
            volume=(compression, stretching),
            strain_w=strain_stiffness,
            volume_w=volume_stiffness,
        )
        b._emit_triangles(node_ids[surface])
        self._dirty = True
        self.render_state_dirty = True
        return node_ids

    def update_fixed_regions(self, region_matrices):
        """Retarget goal constraints from updated region transforms
        (``PrimitiveUtilities.cpp:114-128``); no recompilation — the
        transforms are traced inputs."""
        regions = self._builder.fixed_regions
        if len(region_matrices) != len(regions):
            raise ValueError(
                f"expected {len(regions)} region matrices, got {len(region_matrices)}"
            )
        self._prepare()
        transforms = np.array(self._topology.goal.transforms)  # mutable copy
        for mat, (_, inv_initial, goal_idx) in zip(region_matrices, regions):
            mat = np.asarray(mat, _F32).reshape(4, 4)
            transforms[goal_idx] = mat @ inv_initial
        self._topology = dataclasses.replace(
            self._topology,
            goal=dataclasses.replace(
                self._topology.goal, transforms=jnp.asarray(transforms)
            ),
        )

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------

    def _prepare(self):
        if not self._dirty:
            return
        b = self._builder
        num_live = b.num_nodes
        positions = b.all_positions()
        inv_mass = b.all_inv_mass()
        velocities = (
            np.concatenate(b.velocities) if b.velocities else np.zeros((0, 3), _F32)
        )
        radius = np.concatenate(b.radius) if b.radius else np.zeros((0,), _F32)

        new_state = make_state(
            positions,
            velocities=velocities,
            inv_mass=inv_mass,
            radius=radius,
            capacity=self._node_capacity,
            num_shape_groups=max(1, len(b.shape_groups)),
        )
        # Preserve live state across incremental scene additions, like the
        # reference growing its node vector without resetting the sim.
        if self._state is not None and self._prepared_nodes > 0:
            k = min(self._prepared_nodes, num_live)
            for field in ("positions", "prev_positions", "velocities"):
                arr = np.asarray(getattr(new_state, field))
                arr[:k] = np.asarray(getattr(self._state, field))[:k]
                new_state = dataclasses.replace(
                    new_state, **{field: jnp.asarray(arr)}
                )
            # Warm-started shape-matching rotations for preserved groups
            # (groups are append-only in the builder, so old ids are stable).
            gq = np.asarray(new_state.shape_quats)
            old_gq = np.asarray(self._state.shape_quats)
            g = min(gq.shape[0], old_gq.shape[0])
            gq[:g] = old_gq[:g]
            # The reference's _simFailed latch survives node-count growth
            # (Solver.cpp:26-28 has no reset path short of clear()).
            new_state = dataclasses.replace(
                new_state,
                shape_quats=jnp.asarray(gq),
                sim_failed=self._state.sim_failed,
            )
        self._state = new_state
        cap = self._state.capacity

        def cat(lst, shape):
            return np.concatenate(lst) if lst else np.zeros(shape, _F32)

        dist_idx = cat(b.dist_idx, (0, 2)).astype(np.int32)
        dist_w = cat(b.dist_w, (0,))
        # Colored Gauss-Seidel for PBD distance projection (see
        # StepConfig.distance_colors): reorder the batch into color classes
        # at build time; the PBD iteration projects classes sequentially.
        distance_colors = ()
        distance_chain = False
        chains_np = None
        if self._options.solver.name == "PBD" and dist_idx.shape[0] > 1:
            dw = np.broadcast_to(
                np.asarray(dist_w, _F32), (dist_idx.shape[0],)
            )
            rest_np = np.linalg.norm(
                positions[dist_idx[:, 1]] - positions[dist_idx[:, 0]],
                axis=-1,
            ).astype(_F32)
            chains_np = _detect_chains(dist_idx, rest_np, dw)
            if chains_np is not None:
                distance_chain = True  # exact sequential (ropes)
            else:
                colored = _color_distance(dist_idx)
                if colored is not None and len(colored[1]) > 1:
                    perm, distance_colors = colored
                    dist_idx = dist_idx[perm]
                    dist_w = dw[perm]
        tris = cat(b.triangles, (0, 3)).astype(np.int32)
        bodies = (
            np.concatenate(b.tri_bodies).astype(np.int32)
            if b.tri_bodies
            and sum(x.shape[0] for x in b.tri_bodies) == tris.shape[0]
            else None
        )
        batches = dict(
            distance=topo_mod.build_distance(dist_idx, positions, dist_w),
            position=topo_mod.build_position(
                cat(b.pos_idx, (0,)).astype(np.int32), positions, cat(b.pos_w, (0,))
            ),
            strain=topo_mod.build_tets(
                cat(b.strain_idx, (0, 4)).astype(np.int32),
                positions,
                cat(b.strain_w, (0,)),
                cat(b.strain_lo, (0,)),
                cat(b.strain_hi, (0,)),
            ),
            volume=topo_mod.build_tets(
                cat(b.volume_idx, (0, 4)).astype(np.int32),
                positions,
                cat(b.volume_w, (0,)),
                cat(b.volume_lo, (0,)),
                cat(b.volume_hi, (0,)),
            ),
            bend=topo_mod.build_bend(
                cat(b.bend_idx, (0, 4)).astype(np.int32),
                positions,
                cat(b.bend_w, (0,)),
            ),
            shape=topo_mod.build_groups(
                [(ids, coords) for ids, coords, _ in b.shape_groups],
                np.asarray([w for _, _, w in b.shape_groups], _F32),
                inv_mass,
                kind="shape",
            ),
            goal=topo_mod.build_groups(
                [(ids, coords) for ids, coords, _ in b.goal_groups],
                np.asarray([w for _, _, w in b.goal_groups], _F32),
                inv_mass,
                kind="goal",
            ),
        )
        topology = topo_mod.assemble_topology(
            cap,
            triangles=tris,
            tets=cat(b.tets, (0, 4)).astype(np.int32),
            tri_bodies=bodies,
            **batches,
        )
        if chains_np is not None:
            c_idx0, c_anchor, c_rest, c_w = chains_np
            topology = dataclasses.replace(
                topology,
                chains=topo_mod.ChainBatch(
                    idx0=jnp.asarray(c_idx0),
                    anchor=jnp.asarray(c_anchor),
                    rest=jnp.asarray(c_rest),
                    w=jnp.asarray(c_w),
                ),
            )

        budget = self._budget or self._auto_budget(positions, tris, bodies)
        if self._budget is None and self._budget_overrides:
            budget = dataclasses.replace(budget, **self._budget_overrides)

        def _is_contiguous(idx_list):
            if not idx_list:
                return False
            idx = np.concatenate(idx_list)
            n4 = idx.size
            cap4 = 4 * _round_up8(idx.shape[0])
            return (
                cap4 <= cap
                and np.array_equal(idx.reshape(-1), np.arange(n4, dtype=idx.dtype))
            )

        strain_contiguous = _is_contiguous(b.strain_idx)
        volume_contiguous = _is_contiguous(b.volume_idx)
        # Fused strain+volume local step: valid when both constraint sets
        # cover the same tets in the same order (identical A matrices; the
        # builders emit one of each per tet, mirroring
        # PrimitiveUtilities.cpp:287-316).
        tet_fused = (
            bool(b.strain_idx)
            and len(b.strain_idx) == len(b.volume_idx)
            and all(
                np.array_equal(si, vi)
                for si, vi in zip(b.strain_idx, b.volume_idx)
            )
            and strain_contiguous == volume_contiguous
        )
        # Packed-body layout: every body owns m contiguous nodes and its
        # stride triangles share one local corner pattern -> the broadphase
        # runs fully packed (collision/broadphase._detect_point_tri_bodies_
        # packed).  Tet soups satisfy this by construction.
        body_nodes, body_off, body_faces = 0, 0, ()
        e = budget.body_stride
        if e > 1 and tris.shape[0]:
            kb = tris.shape[0] // e
            tn = tris.reshape(kb, e * 3)
            mins = tn.min(axis=1)
            m = int(tn[0].max() - mins[0] + 1)
            local = tris.reshape(kb, e, 3) - mins[:, None, None]
            padded_t = int(topology.triangles.shape[0])
            if (
                m <= 8
                and padded_t % e == 0
                and np.all(tn.max(axis=1) - mins + 1 == m)
                and np.array_equal(
                    mins, mins[0] + np.arange(kb, dtype=mins.dtype) * m
                )
                and np.all(local == local[0])
                and int(mins[0]) + (padded_t // e) * m <= cap
            ):
                body_nodes, body_off = m, int(mins[0])
                body_faces = tuple(
                    tuple(int(v) for v in row) for row in local[0]
                )
        # Super-body layout (the GENERAL fast path): any triangle scene with
        # no all-covering uniform body stride — packed prefix + loose rows,
        # shared-node exclusion as static topology (broadphase.
        # _detect_point_tri_super).  Small scenes keep the exact all-pairs
        # path instead.
        super_fields = {}
        if (
            body_nodes == 0
            and budget.body_stride == 1
            and self._enable_collisions
            and self._broadphase_mode == "celllist"
            and bodies is not None
            and tris.shape[0] > self._allpairs_max
        ):
            sup = _detect_super_layout(tris, bodies, cap)
            if sup is not None:
                super_fields, sc_np, adj_np = sup
                topology = dataclasses.replace(
                    topology,
                    super_corners=sc_np,
                    super_adj=adj_np,
                )
                if self._budget is None:
                    # Body-granular narrow budget (see _auto_budget's
                    # stride>1 rationale): adjacency pre-drop keeps mesh
                    # neighbors out, so narrow slots hold true contacts
                    # only.  The raw entry budget must absorb mesh-adjacent
                    # entries BEFORE that drop (a cloth body's cell window
                    # holds ~20 statically-excluded neighbors; the packed
                    # soup's 24 sufficed because its bodies are disjoint) —
                    # gather width adapts to the live maximum, so settled
                    # scenes still run the narrow tiers.
                    # nbw 64: a mixed pile's densest body (soup tet under
                    # fully draped cloth) sees ~32 exact-tier AABB overlaps
                    # and ~43 slack-inflated ones once SETTLED (measured at
                    # the pre-latch tick of the small mixed drape scene —
                    # 32 hit the old nbw=32 budget exactly and latched);
                    # exact-tier overflow LATCHES sim failure rather than
                    # dropping contacts, so the budget needs 2x headroom.
                    # bmax 512: raw per-row entry totals reach ~234 in the
                    # same resting drape (every cloth triangle is its own
                    # body, so a soup body's 27-cell window collects ~9
                    # entries/cell) and gather truncation also latches.
                    # Width-adaptive phase-1/gather tiers keep calm-scene
                    # cost at the live width, not the static budget.
                    auto = dict(
                        max_narrow_bodies=64,
                        max_candidates_per_body=512,
                    )
                    for k in self._budget_overrides or ():
                        auto.pop(k, None)  # user overrides win
                    budget = dataclasses.replace(budget, **auto)

        # One batched transfer for the whole scene (state + topology):
        # per-array uploads through a remote-TPU tunnel measured ~5s each.
        self._state, self._topology = jax.device_put((self._state, topology))

        # Small-scene prefactorization (Topology.ata_dense/inv_dense): the
        # TPU-native analog of the reference's SimplicialLLT prefactorization
        # (Solver.cpp:212-215).  Built once per topology change, like the
        # reference's lazy re-precompute on node-count change.
        has_offdiag = any(
            b.idx.shape[0]
            for b in (batches["distance"], batches["strain"],
                      batches["volume"], batches["bend"])
        )
        if cap <= self._dense_operator_max and has_offdiag:
            from ..collision.batches import empty_collision_set
            from . import assembly

            eye = jnp.eye(cap, dtype=jnp.float32)
            zeros = jnp.zeros(cap, jnp.float32)
            ata = assembly.apply_system(
                eye,
                zeros,
                self._topology,
                empty_collision_set(),
                strain_contiguous=False,
                volume_contiguous=False,
                static_diag=zeros,
            )
            h = self._options.fixed_timestep_size / max(
                1, self._options.time_substeps
            )
            m_h2 = np.asarray(self._state.mass) / (h * h)
            try:
                inv = np.linalg.inv(
                    np.asarray(ata, np.float64) + np.diag(m_h2)
                ).astype(_F32)
            except np.linalg.LinAlgError:
                inv = None  # singular (massless unconstrained node): skip
            if inv is not None and np.all(np.isfinite(inv)):
                extra = {}
                d = batches["distance"]
                if d.idx.shape[0]:
                    # Dense distance incidence (+1 at idx1, -1 at idx0):
                    # turns the local-step gather and force scatter into
                    # two MXU matmuls on small scenes (assembly notes).
                    di = np.asarray(d.idx)
                    cd = di.shape[0]
                    dmat = np.zeros((cd, cap), _F32)
                    rows = np.arange(cd)
                    np.add.at(dmat, (rows, di[:, 1]), 1.0)
                    np.add.at(dmat, (rows, di[:, 0]), -1.0)
                    extra["dist_dense"] = jnp.asarray(dmat)
                self._topology = dataclasses.replace(
                    self._topology,
                    ata_dense=jnp.asarray(np.asarray(ata)),
                    inv_dense=jnp.asarray(inv),
                    **extra,
                )

        # Cell-list cell size: largest triangle extent with headroom for
        # deformation and per-substep sweep; retunable without recompiling.
        if tris.shape[0]:
            ext = (positions[tris].max(axis=1) - positions[tris].min(axis=1)).max()
            self._broadphase_cell = float(max(0.25, 1.5 * ext))
        self._config = StepConfig(
            solver=self._options.solver,
            time_substeps=int(self._options.time_substeps),
            iterations=int(self._options.iterations),
            collision_stabilization_iterations=int(
                self._options.collision_stabilization_iterations
            ),
            cg_iterations=self._cg_iterations,
            cg_rtol=self._cg_rtol,
            rotation_iterations=self._rotation_iterations,
            enable_collisions=self._enable_collisions,
            enable_edge_collisions=self._enable_edge_collisions,
            enable_node_collisions=self._enable_node_collisions,
            reference_quirks=self._reference_quirks,
            broadphase_mode=self._broadphase_mode,
            contact_coupling=self._contact_coupling,
            strain_contiguous=strain_contiguous,
            volume_contiguous=volume_contiguous,
            tet_fused=tet_fused,
            body_nodes=body_nodes,
            body_node_offset=body_off,
            body_faces=body_faces,
            budget=budget,
            distance_colors=distance_colors,
            distance_chain=distance_chain,
            allpairs_broadphase_max=self._allpairs_max,
            **super_fields,
        )
        # Temporal broadphase cache for the packed-body path (see
        # state.BroadphaseCache): sized per scene, reset on every prepare
        # (fresh=False forces a rebuild at the next detection).  The slack
        # bounds how far any node may drift before candidates are rebuilt;
        # it must stay well under typical inter-body gaps (the build-time
        # prefilter inflates by 2x slack, and the slack-tier near-neighbors
        # it admits occupy narrow-buffer slots in resting piles) — a small
        # fraction of the cell works for every bench scene and recompiles
        # nothing (traced scalar).  A/B on the 500k soup (scripts/ab_slack):
        # cell/8 best overall (settled 41.7 ms vs 50.7 at cell/16 — fewer
        # rebuilds — and fresh 23.7 vs 21.3; cell/4 loses both ways from
        # slack-tier volume).
        self._broadphase_slack = self._broadphase_cell / 8.0
        if body_nodes > 0 and budget.body_stride > 1:
            kb = int(topology.triangles.shape[0]) // budget.body_stride
            self._state = dataclasses.replace(
                self._state,
                bp=jax.tree.map(
                    jnp.asarray,
                    empty_broadphase_cache(
                        kb, budget.max_narrow_bodies, kb * body_nodes
                    ),
                ),
            )
        elif super_fields:
            # Super-body temporal cache: displacement reference spans ALL
            # nodes (packed blocks + loose corners both live there).
            self._state = dataclasses.replace(
                self._state,
                bp=jax.tree.map(
                    jnp.asarray,
                    empty_broadphase_cache(
                        super_fields["super_k"],
                        budget.max_narrow_bodies,
                        int(self._state.capacity),
                    ),
                ),
            )
        # Temporal node-pair cache for the PBD response (state.NodePairCache):
        # the reference's radiusPadding 0.5 gives the displacement bound, so
        # quiescent iterations skip the whole grid build/query/dedup chain.
        if (
            self._options.solver.name == "PBD"
            and self._enable_collisions
        ):
            self._state = dataclasses.replace(
                self._state,
                nn=jax.tree.map(
                    jnp.asarray,
                    empty_node_pair_cache(
                        int(self._state.capacity),
                        budget.max_candidates_per_node,
                    ),
                ),
            )
        self._prepared_nodes = num_live
        self._dirty = False

    def _auto_budget(
        self,
        positions: np.ndarray,
        tris: np.ndarray,
        bodies: np.ndarray | None = None,
    ) -> CollisionBudget:
        """Size the static collision budgets from the scene's actual triangle
        extents.  In quirk mode the triangle grid has unit cells
        (``Solver.cpp:659-670``), so a triangle's covered-cell count is
        roughly the product of its axis extents (+2 cells of boundary slack
        and swept motion margin per axis)."""
        base = CollisionBudget()
        if tris.shape[0] == 0 or positions.shape[0] == 0:
            return base
        if self._broadphase_mode == "celllist":
            # Uniform-stride collision bodies (e.g. 4 faces per tet) unlock
            # the body-granular broadphase: insertion and candidate
            # gathering shrink by the stride (the candidate gather by
            # stride^2).
            stride = 1
            if bodies is not None and bodies.size:
                _, counts = np.unique(bodies, return_counts=True)
                e = int(counts[0])
                starts = np.nonzero(
                    np.concatenate([[True], bodies[1:] != bodies[:-1]])
                )[0]
                cap8 = -(-tris.shape[0] // 8) * 8
                if (
                    e > 1
                    and np.all(counts == e)
                    and np.all(starts % e == 0)
                    and cap8 % e == 0
                ):
                    stride = e
            # Query ranges can reach 4-5 cells per axis when items deform
            # or move fast (extent up to 2 cells + 1 halo cell).
            return CollisionBudget(
                max_cells_per_tri=32,
                max_entries_per_cell=32,
                max_candidates_per_tri=96,
                max_point_tri_contacts=max(256, -(-tris.shape[0] // 8) // 8 * 8 + 8),
                max_narrow_candidates=16 if stride > 1 else 32,
                # 16 narrow bodies: resting piles hold ~6 touching neighbors
                # plus the cache's slack-tier near-neighbors — 8 overflowed
                # (forcing per-substep rebuilds, nullifying the temporal
                # cache exactly in the settled scenes it serves).  Phase 1
                # width-adapts to the live maximum, so the bigger static
                # budget costs nothing when few survive.
                max_narrow_bodies=16 if stride > 1 else 8,
                body_stride=stride,
            )
        scale = 1.0 if self._reference_quirks else self._options.grid_spacing
        p = positions[tris] / scale  # [T,3,3]
        ext = p.max(axis=1) - p.min(axis=1)  # [T,3]
        cells = np.prod(np.ceil(ext) + 2.0, axis=1)
        need = int(min(np.max(cells) * 1.5, 512))
        max_cells = int(np.clip(-(-need // 8) * 8, 16, 512))
        return CollisionBudget(
            max_cells_per_tri=max_cells,
            max_candidates_per_tri=max(32, max_cells + 32),
            max_point_tri_contacts=max(256, 2 * tris.shape[0]),
        )

    def current_params(self):
        """The exact ``PhysicsParams`` a ``tick()`` would use right now
        (scene-tuned broadphase cell + hinge toggle included) — so external
        harnesses compile the same program as the public API.

        Cached per (options, hinge, cell): rebuilding PhysicsParams uploads
        ~11 scalars, and through a remote-TPU tunnel each upload costs a
        round trip — per-tick rebuilding measured ~100 ms/tick of pure host
        overhead at stress scale.
        """
        self._prepare()
        slack = getattr(self, "_broadphase_slack", 0.0)
        key = (
            self._options, self.release_hinge, self._broadphase_cell, slack
        )
        if getattr(self, "_params_key", None) != key:
            self._params_cache = make_params(
                self._options,
                release_hinge=self.release_hinge,
                broadphase_cell=self._broadphase_cell,
                broadphase_slack=slack,
            )
            self._params_key = key
        return self._params_cache

    def _tick_n_closed(self, n: int):
        """A jitted ``n``-tick step that closes over topology/params.

        ``tick_n`` passes state + topology + params as arguments — 79 pytree
        leaves at stress scale, and per-dispatch overhead through the
        remote-TPU tunnel scales with argument leaf count (measured
        6.7 ms/dispatch of the ~28 ms total; scripts/ab_dispatch.py).
        Topology and params are constant between scene/option changes, so
        they are baked into the executable as device constants and only the
        state crosses the dispatch boundary.  Cached per
        (n, topology identity, params key, config); ``_prepare`` and
        ``current_params`` refresh the inputs this key derives from.
        """
        key = (n, id(self._topology), self._params_key, id(self._config))
        cached = getattr(self, "_tickn_closed_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        topo, params, config = self._topology, self._params_cache, self._config

        @jax.jit
        def fn(state):
            def body(s, _):
                s2, res = tick_fn(s, topo, params, config)
                return s2, res

            st, rs = jax.lax.scan(body, state, None, length=n)
            return st, rs[-1]

        self._tickn_closed_cache = (key, fn)
        return fn

    def tick(self, delta_time: float = 0.0):
        """Advance one tick.  Like the reference, the wall-clock argument is
        ignored in favor of the fixed timestep (``Solver.cpp:40-42,165``)."""
        params = self.current_params()
        t0 = time.perf_counter()
        self._state, residual = tick_fn(
            self._state, self._topology, params, self._config
        )
        # A value fetch, not block_until_ready: over the remote-TPU tunnel
        # block_until_ready can return while the step is still enqueued
        # (measured: ticks "completing" in 0.2 ms at 500k), which would make
        # last_tick_seconds and any caller-side timing meaningless.  Fetching
        # one scalar forces real completion for one round trip.
        self._failed_host = bool(self._state.sim_failed)
        self.last_tick_seconds = time.perf_counter() - t0
        # Keep the residual on device; fetching it every tick would cost a
        # device->host round trip per tick (see last_residual property).
        self._residual_dev = residual
        self.ticks += 1
        self.render_state_dirty = True

    def run_ticks(self, n: int):
        """Advance ``n`` ticks in ONE device dispatch (``lax.scan`` over the
        tick body).  Semantically identical to ``n`` calls of :meth:`tick`;
        per-dispatch overhead (tens of ms through a remote-TPU tunnel, times
        the argument leaf count) is paid once instead of ``n`` times — the
        production stepping API for throughput-bound use.
        """
        params = self.current_params()
        n = int(n)
        # Dispatch budget: single device EXECUTIONS beyond ~40-75 s kill
        # the remote-TPU worker ("TPU worker process crashed or restarted"
        # — measured on the 110k-node imported mesh at 4.7 s/tick x 40-tick
        # scans; compiles of any length survive).  Only large shared-node
        # scenes have ticks slow enough to hit this; everything else keeps
        # the single-dispatch protocol (an extra dispatch is ~28 ms of
        # tunnel overhead — material for fast scenes, noise for slow ones).
        budget = float(os.environ.get("PIES_DISPATCH_BUDGET_S", 25.0))
        heavy = (
            self._state.capacity >= 65536
            and getattr(self._topology, "ell_nbr", None) is not None
        )
        t0 = time.perf_counter()
        if heavy:
            done = 0
            override = getattr(self, "max_ticks_per_dispatch", None)
            while done < n:
                per = self.last_tick_seconds
                if override:
                    # Pinned chunk size: measurement harnesses set this so
                    # the adaptive sizing can't pick a fresh power of two
                    # mid-measurement (a new size = a new executable = a
                    # multi-minute compile inside the timed window).
                    chunk = min(n - done, int(override))
                elif per and per > 0:
                    chunk = max(1, min(n - done, int(budget / per)))
                    # Power-of-two quantization: every distinct chunk size
                    # is its own executable (~minutes of compile at this
                    # scale), so keep the set of sizes tiny and reusable.
                    chunk = 1 << (chunk.bit_length() - 1)
                else:
                    chunk = 1  # blind probe; also seeds the timing estimate
                tc0 = time.perf_counter()
                self._state, residual = self._tick_n_closed(chunk)(
                    self._state
                )
                self._failed_host = bool(self._state.sim_failed)
                self.last_tick_seconds = (time.perf_counter() - tc0) / chunk
                self._residual_dev = residual
                done += chunk
        else:
            self._state, residual = self._tick_n_closed(n)(self._state)
            self._failed_host = bool(self._state.sim_failed)  # real sync
            self._residual_dev = residual
        self.last_tick_seconds = (time.perf_counter() - t0) / max(1, n)
        self.ticks += n
        self.render_state_dirty = True

    @property
    def last_residual(self) -> float:
        """CG residual of the last tick (fetched lazily from device)."""
        if getattr(self, "_residual_dev", None) is None:
            return 0.0
        return float(self._residual_dev)

    @last_residual.setter
    def last_residual(self, value: float):
        self._residual_dev = value

    @property
    def sim_failed(self) -> bool:
        if self._state is None:
            return False
        return bool(self._state.sim_failed)

    @property
    def state(self) -> SolverState:
        self._prepare()
        return self._state

    @property
    def topology(self):
        self._prepare()
        return self._topology

    @property
    def options(self) -> SolverOptions:
        return self._options

    def clear(self):
        """Wipe the scene (``Solver::clear``, ``Solver.cpp:488-507``)."""
        self._builder = SceneBuilder(seed=0)
        self._state = None
        self._topology = None
        self._prepared_nodes = 0
        self._dirty = True
        self.render_state_dirty = True

    # ------------------------------------------------------------------
    # render-facing output (Solver.h:65-69)
    # ------------------------------------------------------------------

    def get_vertices(self) -> dict[str, np.ndarray]:
        """Positions + radius + PBR material per node — the ``getVertices``
        payload (``Solver.h:42-49,65``)."""
        self._prepare()
        n = self._prepared_nodes
        b = self._builder
        return {
            "position": np.asarray(self._state.positions)[:n],
            "radius": np.asarray(self._state.radius)[:n],
            "base_color": np.concatenate(b.base_color)[:n]
            if b.base_color
            else np.zeros((0, 3), _F32),
            "roughness": np.concatenate(b.roughness)[:n]
            if b.roughness
            else np.zeros((0,), _F32),
            "metallic": np.concatenate(b.metallic)[:n]
            if b.metallic
            else np.zeros((0,), _F32),
        }

    def get_lines(self) -> np.ndarray:
        """Wireframe index pairs over distance constraints (``Solver.h:67``)."""
        b = self._builder
        return (
            np.concatenate(b.lines).reshape(-1)
            if b.lines
            else np.zeros(0, np.int32)
        )

    def get_triangles(self) -> np.ndarray:
        b = self._builder
        return (
            np.concatenate(b.triangles)
            if b.triangles
            else np.zeros((0, 3), np.int32)
        )

    # ------------------------------------------------------------------
    # checkpoint / resume (new capability; SURVEY §5 'worth adding')
    # ------------------------------------------------------------------

    def save(self, path: str):
        self._prepare()
        save_state(path, self._state)

    def load(self, path: str):
        self._prepare()
        self._state = load_state(path, self._state)
