"""Integration tests: host Solver API, canonical scenes, PD global solve
fidelity vs a dense oracle, determinism, checkpoint/resume."""

import numpy as np
import pytest

import jax.numpy as jnp

import pies_tpu as pt
from pies_tpu import Solver, topology as T
from pies_tpu.options import SolverName, SolverOptions, StepConfig, make_params
from pies_tpu.solver import assembly
from pies_tpu.solver.step import tick
from pies_tpu.collision.batches import empty_collision_set

import oracle


def settle(solver, n):
    for _ in range(n):
        solver.tick()


class TestRope:
    """BASELINE config 1: rope, fixed + distance constraints, PBD."""

    def _solver(self, solver_name):
        opts = SolverOptions(solver=solver_name)
        s = Solver(opts, enable_collisions=False)
        s.create_rope((0, 12.0, 0), (10, 12.0, 0), 32, w=1.0 if solver_name == SolverName.PBD else 5000.0)
        return s

    def test_pbd_rope_swings_inextensibly(self):
        # Under the reference's EXACT sequential asymmetric projection
        # (Constraints.cpp:29-36 applied in order at Solver.cpp:65-67,
        # reproduced by the chain scan — TestChainScan), a pinned horizontal
        # rope is follow-the-leader: inextensible, but it does NOT pendulum
        # down — the one-sided projection doesn't conserve momentum, so the
        # chain crumples toward the pin (sequential f64 oracle after 150
        # ticks: free end (-1.32, 11.29, 0)).  The old "sags below y=7"
        # expectation was an artifact of the divergent count-averaged Jacobi
        # form, which sagged by STRETCHING.
        s = self._solver(SolverName.PBD)
        settle(s, 150)
        p = s.get_vertices()["position"]
        assert not s.sim_failed
        # Pin holds.
        np.testing.assert_allclose(p[0], [0, 12.0, 0], atol=1e-3)
        # Dynamics are live: the free end traveled far from (10, 12, 0).
        assert np.linalg.norm(p[-1] - np.array([10.0, 12.0, 0.0])) > 5.0
        # Inextensible — every segment within 5% of rest (the sequential
        # projection's strong guarantee; Jacobi needed 60% slack here).
        seg = np.linalg.norm(np.diff(p, axis=0), axis=1)
        rest = 10.0 / 31
        assert np.all(seg < rest * 1.05)

    def test_pd_rope_hangs(self):
        s = self._solver(SolverName.PD)
        settle(s, 300)
        p = s.get_vertices()["position"]
        assert not s.sim_failed
        np.testing.assert_allclose(p[0], [0, 12.0, 0], atol=0.15)
        assert p[-1, 1] < 7.0

    def test_determinism(self):
        a = self._solver(SolverName.PD)
        b = self._solver(SolverName.PD)
        settle(a, 50)
        settle(b, 50)
        np.testing.assert_array_equal(
            a.get_vertices()["position"], b.get_vertices()["position"]
        )


class TestSheet:
    """BASELINE config 2: hanging cloth, PD with CG global step."""

    def test_pd_sheet_sags(self):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_sheet((0.0, 8.0, 0.0), scale=1.0, mass=1.0, w=1000.0)
        settle(s, 100)
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        # Border pinned near initial height, center sags below it.
        border_y = p[0, 1]
        center = p.reshape(20, 20, 3)[10, 10]
        assert center[1] < border_y - 0.2
        assert s.last_residual < 1e-2

    def test_releasehinge_drops_sheet(self):
        s = Solver(SolverOptions(solver=SolverName.PBD), enable_collisions=False)
        s.create_sheet((0.0, 8.0, 0.0), scale=1.0, mass=1.0, w=1.0)
        settle(s, 20)
        held = s.get_vertices()["position"][:, 1].min()
        s.release_hinge = True
        settle(s, 100)
        dropped = s.get_vertices()["position"][:, 1]
        # Without pins the whole sheet falls (until the floor clamp at
        # radius 0.5).
        assert dropped.max() < held + 1e-3
        assert dropped.min() <= 0.5 + 1e-3


class TestTetBox:
    def test_tetbox_drop_pd(self):
        s = Solver(
            SolverOptions(solver=SolverName.PD, iterations=4),
            enable_collisions=False,
        )
        s.create_tet_box((0.0, 4.0, 0.0), 1.0, (0, 0, 0), w=1000.0, mass=1.0)
        settle(s, 200)
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        # Box fell and rests near the floor (static contacts via triangles).
        assert p[:, 1].min() > -1.0
        assert p[:, 1].max() < 4.0
        # Volume roughly preserved: edge lengths near scale.
        tets = np.asarray(s.topology.tets)[np.asarray(s.topology.tet_mask) > 0]
        e = p[tets[:, 1]] - p[tets[:, 0]]
        vol_proxy = np.abs(e).mean()
        assert 0.3 < vol_proxy < 2.0

    def test_pbd_tetbox_quirk_vs_fixed(self):
        # Quirk mode reproduces the reference's PBD tet projection (toward
        # the origin); non-quirk recenters. Both must run without NaNs.
        for quirks in (True, False):
            s = Solver(
                SolverOptions(solver=SolverName.PBD),
                enable_collisions=False,
                reference_quirks=quirks,
            )
            s.create_tet_box((0.0, 3.0, 0.0), 1.0, (0, 0, 0), w=0.1, mass=1.0)
            settle(s, 30)
            assert np.all(np.isfinite(s.get_vertices()["position"]))


class TestShapeMatching:
    def test_shape_box_falls_rigidly(self):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_shape_matching_box((0.0, 5.0, 0.0), 4, 4, 4, 0.5, (0, 0, 0), w=500.0)
        settle(s, 120)
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        # Falls under gravity, keeps its shape: pairwise extents preserved.
        ext = p.max(axis=0) - p.min(axis=0)
        np.testing.assert_allclose(ext, [1.5, 1.5, 1.5], atol=0.2)
        assert p[:, 1].mean() < 4.0

    def test_shape_matching_sheet_builds(self):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_shape_matching_sheet((0, 3.0, 0), 0.2, (0, 0, 0), w=100.0)
        settle(s, 5)
        assert not s.sim_failed
        # The reference's patch-id formula (i/pw*ph + j/ph,
        # PrimitiveUtilities.cpp:1089) aliases distinct (i/3, j/3) pairs into
        # 65 populated patches (its remaining 191 are empty constraints we
        # skip); member assignment matches the reference exactly.
        assert len(s._builder.shape_groups) == 65


class TestGoalRegions:
    def test_fixed_region_drives_nodes(self):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        ids = s.add_nodes(np.array([[0, 0, 0], [0.5, 0, 0], [5, 0, 0]], np.float32))
        region = np.eye(4, dtype=np.float32)  # unit box at origin: first 2 nodes
        s.add_fixed_regions([region], w=5000.0)
        assert len(s._builder.goal_groups) == 1
        assert s._builder.goal_groups[0][0].shape[0] == 2

        # Drive the region upward; constrained nodes should follow.
        moved = region.copy()
        moved[1, 3] = 2.0
        settle(s, 1)
        s.update_fixed_regions([moved])
        settle(s, 120)
        p = s.get_vertices()["position"]
        assert p[0, 1] > 1.5 and p[1, 1] > 1.5
        assert p[2, 1] <= 0.5 + 1e-3  # free node fell to the floor


class TestBendSheet:
    def test_bend_sheet_runs(self):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_bend_sheet((0, 2.0, 0), 0.5, w=100.0)
        settle(s, 60)
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        assert np.all(np.isfinite(p))
        # Pinned columns stay put; the free edge curls downward.
        gid = np.arange(100).reshape(10, 10)
        assert p[gid[0, 0], 1] > 1.5
        assert p[gid[9, 0], 1] < p[gid[0, 0], 1]


class TestPDGlobalSolveFidelity:
    """The matrix-free PCG must match a dense solve of the same system
    (the oracle for Eigen's SimplicialLLT, Solver.cpp:212-215,356)."""

    def test_cg_matches_dense(self):
        rng = np.random.default_rng(0)
        n = 24
        pos = rng.standard_normal((n, 3)).astype(np.float32) * 2
        pairs = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
        state = pt.make_state(pos, capacity=n)
        topo = T.assemble_topology(
            n,
            distance=T.build_distance(pairs, pos, 500.0),
            position=T.build_position(np.array([0, 5]), pos, 2000.0),
        )
        h = 0.012
        colls = empty_collision_set()
        mass_over_h2 = np.asarray(state.mass) / h**2

        b = rng.standard_normal((n, 3)).astype(np.float32) * 10

        x, res = assembly.pcg_solve(
            lambda v: assembly.apply_system(
                v, jnp.asarray(mass_over_h2), topo, colls
            ),
            jnp.asarray(b),
            jnp.zeros((n, 3), jnp.float32),
            assembly.system_diag(jnp.asarray(mass_over_h2), topo, colls),
            iterations=100,
        )

        # Dense oracle.
        contributions = []
        di = np.asarray(topo.distance.idx)
        dw = np.asarray(topo.distance.w)
        a_dist = np.array([[0.5, -0.5], [-0.5, 0.5]])
        for c in range(di.shape[0]):
            if dw[c] > 0:
                contributions.append((di[c], dw[c], a_dist))
        pi = np.asarray(topo.position.idx)
        pw = np.asarray(topo.position.w)
        for c in range(pi.shape[0]):
            if pw[c] > 0:
                contributions.append(([pi[c]], pw[c], np.eye(1)))
        m = oracle.dense_pd_matrix(n, np.asarray(state.mass), h, contributions)
        want = np.linalg.solve(m, b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(x), want, rtol=1e-4, atol=1e-4)

    def test_cg_with_tets_matches_dense(self):
        rng = np.random.default_rng(1)
        n_tets = 6
        n = n_tets * 4
        pos = np.zeros((n, 3), np.float32)
        idx = np.arange(n).reshape(n_tets, 4).astype(np.int32)
        for t in range(n_tets):
            base = rng.standard_normal(3)
            pos[idx[t, 0]] = base
            pos[idx[t, 1]] = base + [1, 0, 0]
            pos[idx[t, 2]] = base + [0, 1, 0]
            pos[idx[t, 3]] = base + [0, 0, 1]
        state = pt.make_state(pos, capacity=n)
        topo = T.assemble_topology(
            n, strain=T.build_tets(idx, pos, 800.0, 0.8, 1.0)
        )
        h = 0.012
        colls = empty_collision_set()
        mass_over_h2 = np.asarray(state.mass) / h**2
        b = rng.standard_normal((n, 3)).astype(np.float32) * 5

        x, _ = assembly.pcg_solve(
            lambda v: assembly.apply_system(
                v, jnp.asarray(mass_over_h2), topo, colls
            ),
            jnp.asarray(b),
            jnp.zeros((n, 3), jnp.float32),
            assembly.system_diag(jnp.asarray(mass_over_h2), topo, colls),
            iterations=120,
        )
        g = np.asarray(topo.strain.g).T.reshape(-1, 3, 4)
        contributions = []
        for t in range(n_tets):
            a4 = np.zeros((4, 4))
            a4[1:4, :] = g[t]
            contributions.append((idx[t], 800.0, a4.T @ a4))
        m = oracle.dense_pd_matrix(n, np.asarray(state.mass), h, contributions)
        want = np.linalg.solve(m, b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-4)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_rope((0, 8.0, 0), (5, 8.0, 0), 16, w=2000.0)
        settle(s, 30)
        path = str(tmp_path / "ckpt.npz")
        s.save(path)
        p_saved = s.get_vertices()["position"].copy()
        settle(s, 30)
        moved = s.get_vertices()["position"]
        assert not np.allclose(p_saved, moved)
        s.load(path)
        np.testing.assert_array_equal(s.get_vertices()["position"], p_saved)
        # Resuming from a checkpoint reproduces the same trajectory.
        settle(s, 30)
        np.testing.assert_array_equal(s.get_vertices()["position"], moved)


class TestSimFailureLatch:
    def test_nan_latches_and_freezes(self):
        s = Solver(SolverOptions(solver=SolverName.PBD), enable_collisions=False)
        ids = s.add_nodes(np.array([[0, 1, 0]], np.float32))
        settle(s, 2)
        # Poison the state with a NaN; the next tick must latch sim_failed
        # and later ticks must no-op (Solver.cpp:26-28 semantics).
        import dataclasses

        bad = np.asarray(s.state.positions).copy()
        bad[0, 0] = np.nan
        s._state = dataclasses.replace(s._state, positions=jnp.asarray(bad))
        s.tick()
        assert s.sim_failed
        frozen = np.asarray(s.state.velocities).copy()
        s.tick()
        np.testing.assert_array_equal(np.asarray(s.state.velocities), frozen)


class TestRenderOutput:
    def test_vertices_lines_triangles(self):
        s = Solver(SolverOptions(), enable_collisions=False)
        s.create_sheet((0, 1, 0), 1.0, 1.0, 100.0)
        assert s.render_state_dirty
        v = s.get_vertices()
        assert v["position"].shape == (400, 3)
        assert v["base_color"].shape == (400, 3)
        lines = s.get_lines()
        assert lines.size > 0 and lines.max() < 400
        tris = s.get_triangles()
        assert tris.shape[1] == 3 and tris.max() < 400
        s.render_state_dirty = False
        s.tick()
        assert s.render_state_dirty  # tick marks render state dirty

    def test_clear(self):
        s = Solver(SolverOptions(), enable_collisions=False)
        s.create_box((0, 1, 0), 1.0, 100.0)
        settle(s, 2)
        s.clear()
        assert s._builder.num_nodes == 0
        s.create_rope((0, 0, 0), (1, 0, 0), 4, 100.0)
        settle(s, 2)
        assert s.get_vertices()["position"].shape == (4, 3)


class TestBandedTetOperator:
    def test_banded_matches_einsum_apply(self):
        # The 7-diagonal banded form of the element-major strain+volume
        # blocks must reproduce the gather/einsum operator exactly.
        import dataclasses

        from pies_tpu import Solver
        from pies_tpu.collision.batches import empty_collision_set
        from pies_tpu.options import SolverName, SolverOptions
        from pies_tpu.solver import assembly

        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_tet_soup(12, 1.6, 0.8, w=2000.0, height=2.0, jitter=0.1)
        s._prepare()
        topo = s._topology
        assert topo.tet_band.shape[1] == s._state.capacity  # band built

        rng = np.random.default_rng(3)
        v = jnp.asarray(
            rng.normal(size=(s._state.capacity, 3)).astype(np.float32)
        )
        colls = empty_collision_set()
        m_h2 = jnp.ones(s._state.capacity, jnp.float32)

        y_band = assembly.apply_system(v, m_h2, topo, colls)
        topo_nb = dataclasses.replace(
            topo, tet_band=jnp.zeros((7, 1), jnp.float32)
        )
        y_ein = assembly.apply_system(v, m_h2, topo_nb, colls)
        np.testing.assert_allclose(
            np.asarray(y_band), np.asarray(y_ein), rtol=2e-5, atol=2e-4
        )


class TestCGConvergenceBound:
    def test_contact_active_residual_bounded(self):
        # SURVEY hard-part (e): stiff contact weights (1e4-1e6) entering the
        # system mid-run must not degrade the global solve.  A contact-rich
        # pile (tet soup compacting under gravity) keeps the CG residual
        # within float32 solver noise relative to the RHS scale at the
        # default 16 iterations.  The stress-scale (500k) variant of this
        # assertion runs on the real chip via PIES_PERF=1.
        import os

        n_tets = 500 if os.environ.get("PIES_PERF") else 24
        ticks = 20 if os.environ.get("PIES_PERF") else 30
        s = Solver(
            SolverOptions(solver=SolverName.PD),
            enable_collisions=True,
            contact_coupling="recentered",
        )
        s.create_tet_soup(n_tets, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05)
        worst = 0.0
        for _ in range(ticks):
            s.tick()
            worst = max(worst, s.last_residual)
        assert not s.sim_failed
        # Residual is an absolute 3-RHS norm; normalize by the system scale
        # (mass/h^2 * |x| ~ 7e3 * n_nodes^0.5) for a scale-free bound.
        n_nodes = s._builder.num_nodes
        rel = worst / (7e3 * np.sqrt(float(n_nodes)))
        assert rel < 1e-3, f"CG residual degraded: {worst} (rel {rel})"

    def test_cg_rtol_early_exit_matches_fixed(self):
        # Masked early exit (cg_rtol) must not change converged trajectories.
        def run(rtol):
            s = Solver(
                SolverOptions(solver=SolverName.PD),
                enable_collisions=False,
                cg_iterations=32,
                cg_rtol=rtol,
            )
            s.create_tet_box((0, 2.0, 0), 1.0, (0, 0, 0), w=1500.0, mass=1.0)
            for _ in range(30):
                s.tick()
            return s.get_vertices()["position"][: s._builder.num_nodes]

        d = np.abs(run(0.0) - run(1e-6)).max()
        assert d < 5e-4

    def test_cg_rtol_early_exit_matches_fixed_contact_heavy(self):
        # Same equivalence on a CONTACT-HEAVY settling soup — the warm
        # start is worst mid-collapse, when stiff (1e5) contact rows enter
        # and leave the system every substep, so this is where the masked
        # early exit could plausibly diverge (the contact-free variant
        # above can't see that regime).
        def run(rtol):
            s = Solver(
                SolverOptions(solver=SolverName.PD),
                enable_collisions=True,
                contact_coupling="recentered",
                cg_iterations=32,
                cg_rtol=rtol,
            )
            s.create_tet_soup(
                24, 1.6, 0.8, w=2000.0, height=0.5, jitter=0.05
            )
            for _ in range(40):
                s.tick()
            assert not s.sim_failed
            return s.get_vertices()["position"][: s._builder.num_nodes]

        d = np.abs(run(0.0) - run(1e-6)).max()
        # Bound is numerical noise of a chaotic 40-tick pile, not an
        # exactness claim: the fori- and while-loop CG variants compile
        # to differently fused programs (measured 5.2e-4 after the
        # round-5 static unroll of the PD iteration loop).
        assert d < 1e-3

    def test_tet_block_cholesky_matches_numpy(self):
        # assembly.tet_block_factor/apply must equal a per-block dense solve.
        from pies_tpu.solver import assembly

        rng = np.random.default_rng(3)
        k = 9
        g = rng.normal(size=(k, 4, 4)).astype(np.float32)
        blocks = (
            np.einsum("kab,kcb->kac", g, g)
            + 3.0 * np.eye(4, dtype=np.float32)[None]
        )
        diag = np.ascontiguousarray(
            np.einsum("kaa->ka", blocks)
        ).reshape(-1)
        b6 = np.stack(
            [
                blocks[:, a, b]
                for a, b in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
            ]
        )
        r = rng.normal(size=(4 * k, 3)).astype(np.float32)
        f = assembly.tet_block_factor(jnp.asarray(diag), jnp.asarray(b6))
        z = np.asarray(assembly.tet_block_apply(f, jnp.asarray(r)))
        z_ref = np.stack(
            [np.linalg.solve(blocks[i], r[4 * i : 4 * i + 4]) for i in range(k)]
        ).reshape(4 * k, 3)
        err = np.abs(z - z_ref).max() / np.abs(z_ref).max()
        assert err < 1e-5, err

    def test_tet_block_precond_matches_jacobi_cg(self):
        # The disjoint-tet exact block preconditioner (auto-enabled for tet
        # soups, Topology.tet_block6) must not change converged trajectories
        # vs plain Jacobi-CG, contacts included.
        from dataclasses import replace as drep

        def run(disable):
            s = Solver(
                SolverOptions(solver=SolverName.PD),
                enable_collisions=True,
            )
            s.create_tet_soup(
                12, spacing=1.6, scale=0.8, w=2000.0, height=1.0, jitter=0.05
            )
            s._prepare()
            assert s._topology.tet_block6 is not None
            if disable:
                s._topology = drep(s._topology, tet_block6=None)
            for _ in range(40):
                s.tick()
            assert not s.sim_failed
            return s.get_vertices()["position"][: s._builder.num_nodes]

        d = np.abs(run(False) - run(True)).max()
        assert d < 1e-3, d


class TestTetColumnFastPath:
    """The tet-column PD fast path (solver/tetcols.py) must reproduce the
    generic pcg path's trajectories: same block-diagonal system, direct
    block solve instead of CG-with-exact-preconditioner, whole iteration in
    corner-major columns."""

    def _run(self, tet_cols, ticks=40, height=0.6, spacing=1.4):
        from dataclasses import replace as drep

        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        # Dense enough for point-tri contacts AND floor contacts.
        s.create_tet_soup(
            24, spacing=spacing, scale=0.8, w=2000.0,
            height=height, jitter=0.05,
        )
        s._prepare()
        s._config = drep(s._config, tet_cols=tet_cols)
        if tet_cols:
            # Make sure the fast path actually engages on this scene.
            from pies_tpu.solver import tetcols

            assert s._topology.tet_block6 is not None
            assert s._config.tet_fused and s._config.strain_contiguous
            assert s._config.contact_coupling in ("diagonal", "recentered")
        for _ in range(ticks):
            s.tick()
        assert not s.sim_failed
        return s.get_vertices()["position"][: s._builder.num_nodes]

    def test_matches_generic_path(self):
        fast = self._run(True)
        slow = self._run(False)
        d = np.abs(fast - slow).max()
        assert d < 1e-3, d
        # Both must have settled into contact (not free fall): some node at
        # the floor.
        assert fast[:, 1].min() < 0.5


class TestChainScan:
    """EXACT sequential PBD distance projection for chain scenes
    (StepConfig.distance_chain + topology.ChainBatch): a lax.scan down the
    link axis reproduces the reference's in-emission-order projection
    (Constraints.h:121-129 applied at Solver.cpp:65-67) — tension traverses
    a whole rope per iteration, where the batched Jacobi form diverges
    beyond ~32 links at 4 iterations (FIDELITY.md #19)."""

    def _rope(self, n, w=1.0):
        opts = SolverOptions(solver=SolverName.PBD)
        s = Solver(opts, enable_collisions=False)
        s.create_rope((0, 12.0, 0), (10, 12.0, 0), n, w=w)
        s._prepare()
        return s

    def test_chain_layout_detected(self):
        s = self._rope(128)
        assert s._config.distance_chain
        assert s._topology.chains is not None
        assert not s._config.distance_colors

    def test_128_link_rope_matches_sequential_oracle(self):
        # The scale where batched Jacobi diverges; the chain scan must track
        # a sequential NumPy transcription of the reference PBD tick
        # (Solver.cpp:47-158, collisions off) through the swing.
        N = 128
        s = self._rope(N)
        opts = s._options

        pos = np.asarray(s._state.positions[:N], np.float64)
        vel = np.zeros_like(pos)
        dist_idx = np.stack([np.arange(1, N), np.arange(0, N - 1)], axis=-1)
        rest = np.linalg.norm(
            pos[dist_idx[:, 1]] - pos[dist_idx[:, 0]], axis=-1
        )
        p_idx = np.asarray(s._topology.position.idx)
        p_tgt = np.asarray(s._topology.position.target)
        p_w = np.asarray(s._topology.position.w)
        radius = np.asarray(s._state.radius[:N], np.float64)
        dt = opts.fixed_timestep_size

        ticks = 150
        for _ in range(ticks):
            prev = pos.copy()
            pos = pos + vel * dt
            pos[:, 1] -= opts.gravity * dt * dt
            for _ in range(opts.iterations):
                for j in range(p_idx.shape[0]):
                    pos[p_idx[j]] += p_w[j] * (p_tgt[j] - pos[p_idx[j]])
                for j in range(dist_idx.shape[0]):
                    a, b = dist_idx[j]
                    diff = pos[b] - pos[a]
                    d = np.linalg.norm(diff)
                    dirv = diff / d if d > 1e-5 else np.array([1.0, 0, 0])
                    pos[a] += -(rest[j] - d) * dirv
                lift = opts.floor_height + radius - pos[:, 1]
                pos[:, 1] += np.maximum(lift, 0.0)
            vel = (1.0 - opts.damping) * (pos - prev) / dt
            on_floor = pos[:, 1] - radius <= opts.floor_height
            sp = np.sqrt(vel[:, 0] ** 2 + vel[:, 2] ** 2)
            scale = np.where(
                on_floor & (sp < 5.0), 0.0,
                np.where(on_floor, 1.0 - opts.friction, 1.0),
            )
            vel[:, 0] *= scale
            vel[:, 2] *= scale

        settle(s, ticks)
        assert not s.sim_failed
        got = np.asarray(s.get_vertices()["position"][:N], np.float64)
        rel = np.abs(got - pos).max() / max(1.0, np.abs(pos).max())
        assert rel < 5e-2, f"chain scan diverged from sequential oracle ({rel:.2e})"
        # Tension reached the whole rope: segments stay near rest length.
        seg = np.linalg.norm(np.diff(got, axis=0), axis=1)
        assert float(seg.max()) < (10.0 / (N - 1)) * 1.05

    def test_parallel_chains(self):
        # Several ropes = several node-disjoint chains advancing in one scan.
        opts = SolverOptions(solver=SolverName.PBD)
        s = Solver(opts, enable_collisions=False)
        for r in range(4):
            s.create_rope((0, 12.0, 1.5 * r), (8, 12.0, 1.5 * r), 64, w=1.0)
        s._prepare()
        assert s._config.distance_chain
        assert s._topology.chains.idx0.shape[0] == 4
        settle(s, 100)
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        for r in range(4):
            seg = p[r * 64: (r + 1) * 64]
            np.testing.assert_allclose(seg[0], [0, 12.0, 1.5 * r], atol=1e-3)
            assert np.isfinite(seg).all()


class TestColoredGS:
    """Colored Gauss-Seidel PBD distance projection
    (StepConfig.distance_colors): when constraints don't form chase chains
    (shared nodes / branching), a build-time greedy coloring groups
    conflict-free constraints; classes project sequentially with the
    reference's exact per-constraint update — within a class no node
    repeats, so class order restores sequential tension propagation."""

    def _net(self, n=8):
        # A PBD net (grid of distance constraints) — branching topology, no
        # chains.
        opts = SolverOptions(solver=SolverName.PBD)
        s = Solver(opts, enable_collisions=False)
        sx = np.linspace(0.0, 4.0, n, dtype=np.float32)
        gx, gz = np.meshgrid(sx, sx, indexing="ij")
        pts = np.stack([gx, np.full_like(gx, 8.0), gz], -1).reshape(-1, 3)
        ids = s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.1)
        g = ids.reshape(n, n)
        pairs = np.concatenate([
            np.stack([g[:-1, :].ravel(), g[1:, :].ravel()], 1),
            np.stack([g[:, :-1].ravel(), g[:, 1:].ravel()], 1),
        ])
        s._builder._emit_distance(pairs, 0.9)
        # Pin one corner.
        s._builder.pos_idx.append(ids[:1])
        s._builder.pos_w.append(np.full(1, 1.0, np.float32))
        s._dirty = True
        s._prepare()
        return s

    def test_coloring_detected(self):
        s = self._net()
        assert not s._config.distance_chain
        assert len(s._config.distance_colors) > 1
        # Classes partition the batch: cumulative ends reach the live count.
        d = s._topology.distance
        ends = s._config.distance_colors
        assert ends[-1] == int(np.asarray(d.w > 0).sum())

    def test_classes_are_conflict_free(self):
        s = self._net()
        idx = np.asarray(s._topology.distance.idx)
        ends = s._config.distance_colors
        s0 = 0
        for e in ends:
            cls = idx[s0:e]
            nodes = cls.reshape(-1)
            assert np.unique(nodes).size == nodes.size, "conflict in class"
            s0 = e

    def test_matches_class_sequential_oracle(self):
        # The jitted iteration must equal a NumPy oracle applying the same
        # color classes in the same order (within a class batch ==
        # sequential: no node repeats).
        s = self._net()
        opts = s._options
        d = s._topology.distance
        idx = np.asarray(d.idx)
        rest = np.asarray(d.rest, np.float64)
        w = np.asarray(d.w, np.float64)
        ends = s._config.distance_colors
        n_live = int((w > 0).sum())
        p_idx = np.asarray(s._topology.position.idx)
        p_tgt = np.asarray(s._topology.position.target, np.float64)
        p_w = np.asarray(s._topology.position.w, np.float64)
        nn = s._builder.num_nodes
        pos = np.asarray(s._state.positions[:nn], np.float64)
        vel = np.zeros_like(pos)
        radius = np.asarray(s._state.radius[:nn], np.float64)
        dt = opts.fixed_timestep_size

        ticks = 100
        for _ in range(ticks):
            prev = pos.copy()
            pos = pos + vel * dt
            pos[:, 1] -= opts.gravity * dt * dt
            for _ in range(opts.iterations):
                for j in range(p_idx.shape[0]):
                    pos[p_idx[j]] += p_w[j] * (p_tgt[j] - pos[p_idx[j]])
                s0 = 0
                for e in ends:
                    a = idx[s0:e, 0]
                    b = idx[s0:e, 1]
                    diff = pos[b] - pos[a]
                    dist = np.linalg.norm(diff, axis=-1)
                    safe = dist > 1e-5
                    dirv = np.where(
                        safe[:, None],
                        diff / np.maximum(dist, 1e-20)[:, None],
                        np.array([1.0, 0.0, 0.0]),
                    )
                    disp = rest[s0:e] - dist
                    pos[a] += w[s0:e, None] * (-disp[:, None] * dirv)
                    s0 = e
                lift = opts.floor_height + radius - pos[:, 1]
                pos[:, 1] += np.maximum(lift, 0.0)
            vel = (1.0 - opts.damping) * (pos - prev) / dt
            on_floor = pos[:, 1] - radius <= opts.floor_height
            sp = np.sqrt(vel[:, 0] ** 2 + vel[:, 2] ** 2)
            scale = np.where(
                on_floor & (sp < 5.0), 0.0,
                np.where(on_floor, 1.0 - opts.friction, 1.0),
            )
            vel[:, 0] *= scale
            vel[:, 2] *= scale

        settle(s, ticks)
        assert not s.sim_failed
        got = np.asarray(s.get_vertices()["position"][:nn], np.float64)
        rel = np.abs(got - pos).max() / max(1.0, np.abs(pos).max())
        assert rel < 5e-2, f"colored GS diverged from class oracle ({rel:.2e})"
