"""Collision pipeline integration tests: sorted-grid broadphase, node-node
response, point-triangle CCD constraints, overflow latch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pies_tpu as pt
from pies_tpu import Solver, topology as T
from pies_tpu.options import (
    CollisionBudget,
    SolverName,
    SolverOptions,
    StepConfig,
    make_params,
)
from pies_tpu.collision.broadphase import (
    detect_point_tri_collisions,
    pbd_node_node_response,
)
from pies_tpu.solver.step import tick


class TestNodeNodeResponse:
    def _push(self, pos, radius):
        state = pt.make_state(
            np.asarray(pos, np.float32),
            radius=np.asarray(radius, np.float32),
        )
        params = make_params(SolverOptions())
        cfg = StepConfig(solver=SolverName.PBD)
        x, vel, _ = pbd_node_node_response(
            state, state.positions, state.velocities, params, cfg
        )
        return np.asarray(x)[: len(pos)]

    def test_overlapping_pair_separates(self):
        x = self._push([[0, 1, 0], [0.6, 1, 0]], [0.5, 0.5])
        d = np.linalg.norm(x[1] - x[0])
        # One symmetric 0.85 push of the 0.4 overlap: 0.6 + 0.85*0.4 = 0.94.
        np.testing.assert_allclose(d, 0.6 + 0.85 * 0.4, atol=1e-3)

    def test_separated_pair_untouched(self):
        x = self._push([[0, 1, 0], [1.5, 1, 0]], [0.5, 0.5])
        np.testing.assert_allclose(x, [[0, 1, 0], [1.5, 1, 0]], atol=1e-6)

    def test_mass_weighting(self):
        pos = np.array([[0, 1, 0], [0.6, 1, 0]], np.float32)
        state = pt.make_state(
            pos,
            radius=np.full(2, 0.5, np.float32),
            inv_mass=np.array([1.0, 0.0], np.float32),  # node 1 infinite mass
        )
        params = make_params(SolverOptions())
        cfg = StepConfig(solver=SolverName.PBD)
        x, _, _ = pbd_node_node_response(
            state, state.positions, state.velocities, params, cfg
        )
        x = np.asarray(x)
        np.testing.assert_allclose(x[1], pos[1], atol=1e-6)  # fixed node
        assert x[0, 0] < -0.3  # movable node takes the full push

    def test_pbd_pile_no_deep_interpenetration(self):
        # Drop a small cluster of spheres into a pile on the floor.
        rng = np.random.default_rng(0)
        n = 24
        pos = rng.uniform([-1, 1.0, -1], [1, 3.0, 1], (n, 3)).astype(np.float32)
        s = Solver(
            SolverOptions(solver=SolverName.PBD, iterations=4),
            enable_collisions=True,
        )
        s.add_nodes(pos)
        for _ in range(120):
            s.tick()
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        assert np.all(np.isfinite(p))
        assert p[:, 1].min() > 0.45  # resting on the floor (radius 0.5)
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        d += np.eye(n) * 10
        # Spheres may touch but not deeply interpenetrate.
        assert d.min() > 0.7


class TestPointTriangleCollisions:
    def test_sweep_detects_crossing(self):
        tri_pos = np.array(
            [
                [0, 0, 0], [2, 0, 0], [0, 0, 2],
                [0.3, 0.5, 0.3], [1.0, 0.5, 0.3], [0.3, 0.5, 1.0],
            ],
            np.float32,
        )
        now = tri_pos.copy()
        now[3:, 1] = -0.5
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        params = make_params(SolverOptions(), broadphase_cell=6.0)
        cfg = StepConfig(solver=SolverName.PD)
        state = pt.make_state(tri_pos, capacity=8)
        prev_p = jnp.asarray(
            np.concatenate([tri_pos, np.asarray(state.positions)[6:]], 0)
        )
        now_p = jnp.asarray(
            np.concatenate([now, np.asarray(state.positions)[6:]], 0)
        )
        pt_idx, pt_mask, overflow = detect_point_tri_collisions(
            now_p, prev_p, jnp.asarray(tris),
            jnp.asarray(np.ones(2, np.float32)), params, cfg,
        )
        hits = np.asarray(pt_idx)[np.asarray(pt_mask) > 0]
        assert not bool(overflow)
        # All three corners of the moving triangle hit the static one.
        assert {tuple(h) for h in hits} == {
            (3, 0, 1, 2), (4, 0, 1, 2), (5, 0, 1, 2)
        }

    def test_reference_mode_detects_crossing(self):
        # The quirk-faithful multi-cell broadphase (world-unit cells,
        # Solver.cpp:659-670) finds the same crossing as the cell list.
        tri_pos = np.array(
            [
                [0, 0, 0], [2, 0, 0], [0, 0, 2],
                [0.3, 0.5, 0.3], [1.0, 0.5, 0.3], [0.3, 0.5, 1.0],
            ],
            np.float32,
        )
        now = tri_pos.copy()
        now[3:, 1] = -0.5
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        params = make_params(SolverOptions(), broadphase_cell=6.0)
        cfg = StepConfig(solver=SolverName.PD, broadphase_mode="reference")
        state = pt.make_state(tri_pos, capacity=8)
        prev_p = jnp.asarray(
            np.concatenate([tri_pos, np.asarray(state.positions)[6:]], 0)
        )
        now_p = jnp.asarray(
            np.concatenate([now, np.asarray(state.positions)[6:]], 0)
        )
        pt_idx, pt_mask, overflow = detect_point_tri_collisions(
            now_p, prev_p, jnp.asarray(tris),
            jnp.asarray(np.ones(2, np.float32)), params, cfg,
        )
        hits = np.asarray(pt_idx)[np.asarray(pt_mask) > 0]
        assert not bool(overflow)
        assert {tuple(h) for h in hits} == {
            (3, 0, 1, 2), (4, 0, 1, 2), (5, 0, 1, 2)
        }

    def test_shared_node_pairs_skipped(self):
        # Two triangles sharing an edge never collide (Solver.cpp:757-770).
        pos = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1]], np.float32
        )
        tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
        params = make_params(SolverOptions(), broadphase_cell=6.0)
        cfg = StepConfig(solver=SolverName.PD)
        state = pt.make_state(pos, capacity=8)
        full = jnp.asarray(
            np.concatenate([pos, np.asarray(state.positions)[4:]], 0)
        )
        _, pt_mask, _ = detect_point_tri_collisions(
            full, full, jnp.asarray(tris),
            jnp.asarray(np.ones(2, np.float32)), params, cfg,
        )
        assert int(np.asarray(pt_mask).sum()) == 0

    def test_pd_tet_rests_on_cloth_patch(self):
        # A pinned horizontal triangle patch; a tet drops onto it and must
        # not fall through (the live PD pipeline, Solver.cpp:680-875).
        s = Solver(
            SolverOptions(solver=SolverName.PD, collision_thickness=0.05),
            enable_collisions=True,
        )
        b = s._builder
        patch = np.array(
            [[-2, 2, -2], [2, 2, -2], [0, 2, 2.5]], np.float32
        )
        patch_ids = b._emit_nodes(patch, inv_mass=1.0, radius=0.1)
        b.pos_idx.append(patch_ids)
        b.pos_w.append(np.full(3, 10000.0, np.float32))
        # Wind the patch so its normal faces +y: the point-triangle
        # constraint is one-sided and only resists approaches from the
        # normal side (CollisionConstraint.cpp:108-123).
        b.triangles.append(patch_ids[None, [0, 2, 1]])
        s._dirty = True
        s.create_tet_soup(1, 1.0, 0.8, w=2000.0, height=3.2)
        for _ in range(150):
            s.tick()
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        tet_y = p[3:, 1]
        # The tet rests on (or slightly above) the patch plane at y=2 and
        # does not fall toward the y=0 floor.
        assert tet_y.min() > 1.6, tet_y

    def test_without_collisions_tet_falls_through(self):
        s = Solver(
            SolverOptions(solver=SolverName.PD),
            enable_collisions=False,
        )
        b = s._builder
        patch = np.array(
            [[-2, 2, -2], [2, 2, -2], [0, 2, 2.5]], np.float32
        )
        patch_ids = b._emit_nodes(patch, inv_mass=1.0, radius=0.1)
        b.pos_idx.append(patch_ids)
        b.pos_w.append(np.full(3, 10000.0, np.float32))
        # Wind the patch so its normal faces +y: the point-triangle
        # constraint is one-sided and only resists approaches from the
        # normal side (CollisionConstraint.cpp:108-123).
        b.triangles.append(patch_ids[None, [0, 2, 1]])
        s._dirty = True
        s.create_tet_soup(1, 1.0, 0.8, w=2000.0, height=3.2)
        for _ in range(150):
            s.tick()
        p = s.get_vertices()["position"]
        # Sanity for the previous test: without the pipeline it passes
        # through the patch down to the floor contacts near y=0.
        assert p[3:, 1].min() < 1.0


class TestEdgeEdgeCollisions:
    """The rebuilt edge-edge pipeline (dead in the reference: generation
    commented out at Solver.cpp:799-823): projection/stabilization kernels
    vs the oracle, and an end-to-end crossing-strips scene."""

    def test_projection_matches_oracle(self):
        from pies_tpu.collision.batches import project_edge_edge
        from tests import oracle

        rng = np.random.default_rng(7)
        # Segment pairs at assorted separations around the threshold,
        # including a parallel (degenerate-det) pair.
        base = rng.normal(size=(8, 4, 3)).astype(np.float32) * 0.4
        base[6] = [[0, 0, 0], [1, 0, 0], [0, 0.03, 0], [1, 0.03, 0]]  # parallel
        base[7] = [[0, 0, 0], [1, 0, 0], [0.5, 0.04, -0.5], [0.5, 0.04, 0.5]]
        im = np.abs(rng.normal(size=(8, 4)).astype(np.float32)) + 0.1
        n = 32
        x = base.reshape(-1, 3)
        inv_mass = im.reshape(-1)
        idx = np.arange(n, dtype=np.int32).reshape(8, 4)
        for quirk in (True, False):
            proj, delta = project_edge_edge(
                jnp.asarray(x), jnp.asarray(inv_mass), jnp.asarray(idx),
                jnp.float32(0.1), quirk,
            )
            proj = np.asarray(proj)
            for k in range(8):
                want = oracle.edge_project(x[idx[k]], inv_mass[idx[k]], 0.1, quirk)
                np.testing.assert_allclose(proj[k], want, atol=2e-5, err_msg=f"quirk={quirk} k={k}")

    def test_generation_feeds_edge_buffer(self):
        # Two triangles whose nearest features are a crossing edge pair
        # (no corner is near the other's face plane interior).
        # reference_quirks=False: the quirk-faithful CCD evaluates proximity
        # at u = v = 0 (the reference's shadowing bug) and misses genuine
        # crossings whose first endpoints are far apart; the rebuilt
        # capability uses the intended closest-point math.
        s = Solver(
            SolverOptions(solver=SolverName.PD),
            enable_collisions=False,
            enable_edge_collisions=True,
            reference_quirks=False,
        )
        b = s._builder
        t1 = b._emit_nodes(
            np.array([[-1, 1, 0], [1, 1, 0], [0, 2.5, 0]], np.float32),
            inv_mass=1.0, radius=0.1,
        )
        t2 = b._emit_nodes(
            np.array([[0, 1.06, -1], [0, 1.06, 1], [0, 2.5, 0.8]], np.float32),
            inv_mass=1.0, radius=0.1,
        )
        b.triangles.append(t1[None, :])
        b.triangles.append(t2[None, :])
        s._dirty = True
        s._prepare()

        from functools import partial
        from pies_tpu.solver.step import default_detect_collisions

        @partial(jax.jit, static_argnames=("config",))
        def detect(state, topo, params, config):
            c = default_detect_collisions(
                state, state.positions, topo, params, config
            )
            return c.edge_idx, c.edge_mask

        e_idx, e_mask = detect(s._state, s._topology, s.current_params(), s._config)
        e_idx, e_mask = np.asarray(e_idx), np.asarray(e_mask)
        assert e_mask.sum() >= 1, "no edge contacts generated"
        live = e_idx[e_mask > 0]
        # The crossing pair (bottom edges of each strip) must be present.
        want = {(0, 1, 3, 4), (1, 0, 3, 4), (0, 1, 4, 3)}
        found = {tuple(sorted(r[:2])) + tuple(sorted(r[2:])) for r in live}
        assert (0, 1, 3, 4) in found, found

    def test_crossing_strips_resolve(self):
        # Same geometry, pinned soft: with edge collisions on, one PD tick
        # pushes the crossing edges apart along their closest direction.
        s = Solver(
            SolverOptions(solver=SolverName.PD, gravity=0.0),
            enable_collisions=False,
            enable_edge_collisions=True,
            reference_quirks=False,
        )
        b = s._builder
        t1 = b._emit_nodes(
            np.array([[-1, 1, 0], [1, 1, 0], [0, 2.5, 0]], np.float32),
            inv_mass=1.0, radius=0.1,
        )
        t2 = b._emit_nodes(
            np.array([[0, 1.02, -1], [0, 1.02, 1], [0, 2.5, 0.8]], np.float32),
            inv_mass=1.0, radius=0.1,
        )
        b.triangles.append(t1[None, :])
        b.triangles.append(t2[None, :])
        s._dirty = True

        def gap(p):
            # vertical separation of the two crossing edges at their
            # crossing point (x=0, z=0)
            return p[3:5, 1].mean() - p[0:2, 1].mean()

        p0 = np.concatenate(b.positions) if False else None
        g0 = 0.02
        for _ in range(10):
            s.tick()
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        assert gap(p) > g0 + 1e-3, (gap(p), g0)


class TestRecenteredContactCoupling:
    """The "recentered" coupling keeps contact AᵀA off-diagonals out of the
    CG operator but compensates in the per-iteration RHS; its fixed point is
    identical to full coupling (assembly.assemble_force docstring)."""

    def _run(self, mode, iterations, ticks=30):
        s = Solver(
            SolverOptions(solver=SolverName.PD, iterations=iterations),
            enable_collisions=True,
            contact_coupling=mode,
            cg_iterations=40,
        )
        # Overlapping mini-pile in immediate floor + self contact.
        s.create_tet_soup(8, spacing=0.9, scale=0.8, w=2000.0, height=0.2,
                          jitter=0.02)
        for _ in range(ticks):
            s.tick()
        assert not s.sim_failed
        return s.get_vertices()["position"]

    def test_fixed_point_matches_full(self):
        # With enough PD iterations both couplings converge to the same
        # iterate.  The window is kept short: contact piles are chaotic, so
        # the fixed-point-truncation difference (CG stops at a tolerance)
        # amplifies over long rollouts even though the target is identical.
        pf = self._run("full", iterations=16, ticks=8)
        pr = self._run("recentered", iterations=16, ticks=8)
        np.testing.assert_allclose(pr, pf, atol=2e-2)

    def test_no_sinking_at_default_iterations(self):
        # The failure mode of the old (uncentered) diagonal coupling was
        # stacked bodies sinking; recentered must hold the pile up.
        pr = self._run("recentered", iterations=4, ticks=60)
        pf = self._run("full", iterations=4, ticks=60)
        assert pr[:, 1].min() > -0.05, "pile sank below the floor"
        np.testing.assert_allclose(
            pr[:, 1].mean(), pf[:, 1].mean(), atol=0.05
        )


class TestOverflowBehavior:
    def test_contact_overflow_degrades_gracefully(self):
        # A 1-contact buffer drops the excess contacts instead of latching:
        # the reference never drops (dynamic vectors) but also only fails at
        # 1000-entry bucket explosions (Solver.cpp:741-755); graceful
        # degradation is the static-shape equivalent.
        budget = CollisionBudget(max_point_tri_contacts=1)
        s = Solver(
            SolverOptions(solver=SolverName.PD),
            enable_collisions=True,
            budget=budget,
        )
        b = s._builder
        patch = np.array([[-2, 2, -2], [2, 2, -2], [0, 2, 2.5]], np.float32)
        patch_ids = b._emit_nodes(patch, inv_mass=1.0, radius=0.1)
        b.pos_idx.append(patch_ids)
        b.pos_w.append(np.full(3, 10000.0, np.float32))
        b.triangles.append(patch_ids[None, [0, 2, 1]])
        s._dirty = True
        s.create_tet_soup(1, 1.0, 0.8, w=2000.0, height=2.6)
        for _ in range(60):
            s.tick()
        assert not s.sim_failed
        assert np.all(np.isfinite(s.get_vertices()["position"]))

    def test_oversized_item_latches(self):
        # A triangle spanning >2 broadphase cells breaks home-cell coverage
        # and must latch (the loud analog of the reference's silent
        # range-cap skip, Solver.cpp:672-674).
        import jax.numpy as jnp
        from pies_tpu.options import make_params as mk

        pos = np.array(
            [[0, 1, 0], [50, 1, 0], [0, 1, 50],  # huge triangle
             [1, 2, 1], [2, 2, 1], [1, 2, 2]],
            np.float32,
        )
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        state = pt.make_state(pos, capacity=8)
        full = jnp.asarray(
            np.concatenate([pos, np.asarray(state.positions)[6:]], 0)
        )
        params = mk(SolverOptions(), broadphase_cell=2.0)
        # Force the grid path: the small-scene all-pairs broadphase has no
        # size cap (it tests every AABB pair exactly), so only the grid
        # path carries the latch.
        cfg = StepConfig(solver=SolverName.PD, allpairs_broadphase_max=0)
        _, _, overflow = detect_point_tri_collisions(
            full, full, jnp.asarray(tris),
            jnp.asarray(np.ones(2, np.float32)), params, cfg,
        )
        assert bool(overflow)

        # The all-pairs path (default for tiny scenes) handles the same
        # oversized item exactly — no latch.
        cfg2 = StepConfig(solver=SolverName.PD)
        _, _, overflow2 = detect_point_tri_collisions(
            full, full, jnp.asarray(tris),
            jnp.asarray(np.ones(2, np.float32)), params, cfg2,
        )
        assert not bool(overflow2)


class TestPDNodeNodeCollisions:
    """The rebuilt dormant PD node-node machinery (Solver.cpp:509-607
    generation, CollisionConstraint.cpp:7-65 constraint, Solver.cpp:398-428
    friction), gated by StepConfig.enable_node_collisions."""

    def test_projection_matches_oracle(self):
        from pies_tpu.collision.batches import project_node_node

        rng = np.random.default_rng(7)
        n = 64
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        radius = rng.uniform(0.2, 0.9, n).astype(np.float32)
        inv_mass = rng.uniform(0.1, 2.0, n).astype(np.float32)
        idx = rng.choice(n, size=(32, 2), replace=True).astype(np.int32)
        idx = idx[idx[:, 0] != idx[:, 1]]

        got = np.asarray(
            project_node_node(
                jnp.asarray(pos), jnp.asarray(radius),
                jnp.asarray(inv_mass), jnp.asarray(idx),
            )
        )

        # NumPy transcription of CollisionConstraint.cpp:10-39.
        for k, (i, j) in enumerate(idx):
            pa, pb = pos[i].astype(np.float64), pos[j].astype(np.float64)
            want = np.stack([pa, pb])
            diff = pb - pa
            dist_sq = float(diff @ diff)
            r = float(radius[i] + radius[j])
            if dist_sq < r * r:
                dist = np.sqrt(dist_sq)
                dl = r - dist
                disp = dl * diff / dist if dist > 1e-5 else np.array([dl, 0, 0])
                w = inv_mass[i] + inv_mass[j]
                want[0] -= disp * inv_mass[i] / w
                want[1] += disp * inv_mass[j] / w
            np.testing.assert_allclose(got[k], want, atol=1e-5)

    def test_generation_pairs_cell_sharing_nodes(self):
        from pies_tpu.collision.broadphase import detect_node_node_pairs

        # Two nearby nodes + one far node: exactly one pair.
        pos = np.array([[0, 1, 0], [0.6, 1, 0], [40, 1, 0]], np.float32)
        state = pt.make_state(pos, capacity=8)
        params = make_params(SolverOptions())
        cfg = StepConfig(solver=SolverName.PD, enable_node_collisions=True)
        nn_idx, nn_mask = jax.jit(
            detect_node_node_pairs, static_argnames=("config",)
        )(state, state.positions, params, config=cfg)
        nn_idx, nn_mask = np.asarray(nn_idx), np.asarray(nn_mask)
        live = nn_idx[nn_mask > 0]
        assert live.shape[0] == 1
        assert set(live[0]) == {0, 1}

    def test_two_sphere_pd_contact(self):
        # Two free spheres overlap; with the node-node machinery on, the PD
        # solve pushes them apart toward the radius sum.  Without it they
        # stay interpenetrated (no other constraint acts on lone nodes).
        def run(enable):
            s = Solver(
                SolverOptions(
                    solver=SolverName.PD, gravity=0.0, iterations=8,
                    collision_stabilization_iterations=0,
                ),
                enable_collisions=False,
                enable_node_collisions=enable,
                cg_iterations=32,
            )
            s.add_nodes(np.array([[0, 5, 0], [0.5, 5, 0]], np.float32))
            for _ in range(20):
                s.tick()
            assert not s.sim_failed
            p = s.get_vertices()["position"][:2]
            return float(np.linalg.norm(p[1] - p[0]))

        d_off = run(False)
        d_on = run(True)
        assert abs(d_off - 0.5) < 1e-3  # untouched without the machinery
        assert d_on > 0.95  # pushed out toward r_sum = 1.0

    def test_friction_damps_relative_sliding(self):
        # Identical touching pairs sliding tangentially, friction 0 vs 0.5:
        # the frictional tick must end with less relative tangential
        # velocity than the frictionless one (the push-out itself also
        # perturbs velocities, so compare runs rather than before/after).
        def run(friction):
            s = Solver(
                SolverOptions(
                    solver=SolverName.PD, gravity=0.0, friction=friction,
                    collision_stabilization_iterations=0,
                ),
                enable_collisions=False,
                enable_node_collisions=True,
            )
            s.add_nodes(np.array([[0, 5, 0], [0.6, 5, 0]], np.float32))
            s._prepare()
            import dataclasses as dc

            s._state = dc.replace(
                s._state,
                velocities=s._state.velocities.at[1, 1].set(2.0),
            )
            s.tick()
            v = np.asarray(s._state.velocities[:2])
            return abs(v[1, 1] - v[0, 1])

        assert run(0.5) < run(0.0) - 0.1


class TestDenseFloorContacts:
    def test_dense_matches_entry_list(self):
        # The dense per-node floor representation (count x activity) must
        # reproduce the per-(triangle, corner) entry list exactly — all
        # entries of a node share their test and projection.
        import dataclasses

        def run(dense):
            s = Solver(
                SolverOptions(solver=SolverName.PD), enable_collisions=False
            )
            s.create_tet_box((0, 2.0, 0), 1.0, (0, 0, 0), w=1500.0, mass=1.0)
            s._prepare()
            s._config = dataclasses.replace(s._config, dense_floor=dense)
            for _ in range(40):
                s.tick()
            assert not s.sim_failed
            return s.get_vertices()["position"][: s._builder.num_nodes]

        d = np.abs(run(True) - run(False)).max()
        assert d < 1e-6


class TestBroadphaseCache:
    """Temporal candidate caching (state.BroadphaseCache): within budgets,
    cached detection must produce contact sets identical to per-substep
    rebuilds, and quiescent states must actually reuse the cache."""

    def _soup(self, spacing):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        s.create_tet_soup(
            24, spacing=spacing, scale=0.8, w=2000.0, height=1.0, jitter=0.05
        )
        s._prepare()
        assert s._state.bp is not None
        return s

    def test_contact_sets_match_uncached(self):
        from functools import partial

        s = self._soup(1.4)
        params = s.current_params()
        cfg, topo = s._config, s._topology
        h = float(params.dt)
        det = jax.jit(
            partial(
                detect_point_tri_collisions,
                triangles=topo.triangles,
                tri_mask=topo.tri_mask,
                config=cfg,
            )
        )
        cache = s._state.bp
        for _ in range(25):
            st = s._state
            x = jnp.asarray(
                np.asarray(st.positions)
                + h
                * np.asarray(st.velocities)
                * np.asarray(st.node_mask)[:, None]
            )
            ia, ma, _, cache = det(
                x, st.prev_positions, params=params, cache=cache
            )
            ib, mb, _ = det(x, st.prev_positions, params=params)
            sa = set(map(tuple, np.asarray(ia)[np.asarray(ma) > 0]))
            sb = set(map(tuple, np.asarray(ib)[np.asarray(mb) > 0]))
            assert sa == sb
            s.tick()

    def test_cache_reuses_when_quiescent(self):
        # A settled soup must (almost) stop rebuilding: the reference
        # positions freeze while displacement stays under the slack.  Piles
        # never reach literal zero velocity (the floor restitution pass
        # keeps a residual jiggle, Solver.cpp:431-484 semantics), so assert
        # a high reuse RATE over a window, not a strictly frozen ref — the
        # failure mode this guards is rebuilding every substep.
        s = self._soup(2.5)  # separated tets: rest on the floor apart
        for _ in range(300):
            s.tick()
        assert bool(s._state.bp.fresh)
        ref = np.asarray(s._state.bp.ref)
        rebuilds = 0
        for _ in range(30):
            s.tick()
            r = np.asarray(s._state.bp.ref)
            if not np.array_equal(r, ref):
                rebuilds += 1
                ref = r
        assert rebuilds <= 5, f"quiescent soup rebuilt {rebuilds}/30 ticks"

    def test_dense_overflow_regime_stays_stable(self):
        # Beyond the candidate budgets the cache self-disables per substep
        # (narrow overflow publishes fresh=False); the pile must still
        # settle on the floor without latching or deep penetration.
        s = self._soup(0.9)
        for _ in range(100):
            s.tick()
        p = s.get_vertices()["position"]
        assert not s.sim_failed
        assert p[:, 1].min() > -0.3
        assert p[:, 1].max() < 2.6


class TestNodePairCache:
    """Temporal node-pair caching for the PBD response (state.NodePairCache).

    The cached pair set is a superset of every touching set within the
    radiusPadding-derived displacement bound, and the response re-tests
    ``disp > 0`` at current positions — so cached ticks must track
    per-iteration rebuilds, rebuild on drift, and stop rebuilding at rest."""

    def _pile(self, n=12, seed=0):
        # Within the per-cell budget (max_entries_per_cell=16) even if every
        # node transits one cell: below budget, the cached pair superset and
        # per-iteration rebuilds must agree exactly (beyond budget, builds at
        # different positions drop different pairs — graceful, not equal).
        rng = np.random.default_rng(seed)
        pos = rng.uniform(
            [-1.5, 1.0, -1.5], [1.5, 3.0, 1.5], (n, 3)
        ).astype(np.float32)
        s = Solver(
            SolverOptions(solver=SolverName.PBD, iterations=4),
            enable_collisions=True,
        )
        s.add_nodes(pos)
        s._prepare()
        assert s._state.nn is not None
        return s

    def test_cached_ticks_match_uncached(self):
        import dataclasses

        sa = self._pile()
        sb = self._pile()
        # Disable the cache on sb: rebuild-every-iteration reference run.
        sb._state = dataclasses.replace(sb._state, nn=None)
        for t in range(6):
            sa.tick()
            sb.tick()
            pa = sa.get_vertices()["position"]
            pb = sb.get_vertices()["position"]
            # Identical pair supersets + exact disp re-test: only scatter
            # summation order differs.
            np.testing.assert_allclose(pa, pb, atol=5e-4)
        assert not sa.sim_failed and not sb.sim_failed

    def test_rebuild_on_drift_catches_new_contacts(self):
        # Two nodes start far apart (no shared cell at build time) and fly
        # toward each other; a never-rebuilt cache would let them tunnel
        # straight through.
        s = Solver(
            SolverOptions(solver=SolverName.PBD, iterations=4, gravity=0.0),
            enable_collisions=True,
        )
        s.add_nodes(np.array([[-6, 5, 0], [6, 5, 0]], np.float32))
        import dataclasses

        s._prepare()
        vel = np.zeros_like(np.asarray(s._state.velocities))
        vel[0] = [8, 0, 0]
        vel[1] = [-8, 0, 0]
        s._state = dataclasses.replace(s._state, velocities=jnp.asarray(vel))
        for _ in range(80):
            s.tick()
        p = s.get_vertices()["position"]
        # They collided and separated along x — never interpenetrated deeply
        # nor tunneled through to swap sides by more than a radius.
        d = abs(float(p[1, 0] - p[0, 0]))
        assert d > 0.7, f"nodes tunneled through each other (gap {d})"
        assert not s.sim_failed

    def test_cache_reuses_at_rest(self):
        s = self._pile()
        for _ in range(150):
            s.tick()
        ref1 = np.asarray(s._state.nn.ref)
        s.tick()
        ref2 = np.asarray(s._state.nn.ref)
        assert bool(s._state.nn.fresh)
        assert np.array_equal(ref1, ref2), "settled pile rebuilt its cache"


class TestSuperBroadphase:
    """The super-body broadphase (broadphase._detect_point_tri_super): the
    round-3 packed machinery generalized to ANY triangle scene — packed
    uniform-body prefix + one loose row per leftover triangle, one grid,
    one narrowphase, static shared-node pair exclusion.  Rebuilds the
    reference's single universal sweep (Solver.cpp:680-875) without its
    per-triangle cost."""

    def _mixed(self, n_tets=40, sheet_n=8):
        # Tet soup + a loose (distance-constrained) cloth dropped onto it:
        # multi-tri bodies form the packed prefix, cloth tris become loose
        # rows.
        # allpairs_broadphase_max=0 forces the grid paths at test scale
        # (real mixed scenes are far above the all-pairs cutoff).
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True,
                   allpairs_broadphase_max=0)
        s.create_tet_soup(n_tets, spacing=1.6, scale=0.8, w=2000.0,
                          height=0.5, jitter=0.05)
        side = int(np.ceil((n_tets * 1.6 ** 3) ** (1 / 3)))
        sx = np.linspace(-side * 0.4, side * 0.4, sheet_n, dtype=np.float32)
        gx, gz = np.meshgrid(sx, sx, indexing="ij")
        pts = np.stack([gx, np.full_like(gx, 2.2), gz], -1).reshape(-1, 3)
        ids = s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.25)
        g = ids.reshape(sheet_n, sheet_n)
        pairs = np.concatenate([
            np.stack([g[:-1, :].ravel(), g[1:, :].ravel()], 1),
            np.stack([g[:, :-1].ravel(), g[:, 1:].ravel()], 1),
            np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel()], 1),
        ])
        s._builder._emit_distance(pairs, 4000.0)
        tris = np.concatenate([
            np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(),
                      g[1:, 1:].ravel()], 1),
            np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(),
                      g[:-1, 1:].ravel()], 1),
        ])
        s._builder._emit_triangles(tris)
        s._dirty = True
        s._prepare()
        return s

    def test_layout_detected(self):
        s = self._mixed()
        cfg = s._config
        assert cfg.super_k > 0
        assert cfg.super_packed_k == 40  # one packed row per tet
        assert cfg.super_packed_m == 4
        assert cfg.super_loose_face >= 0
        assert s._topology.super_corners is not None
        # Cloth mesh neighbors share nodes -> static adjacency exists.
        assert s._topology.super_adj is not None

    def _exact_cfg(self, cfg):
        import dataclasses

        # The per-triangle sweep re-emits a (corner, tri) contact once per
        # own face (~2.5x multiplicity), so ITS contact cap needs headroom
        # to keep every deduped contact the super path reports.
        return dataclasses.replace(
            cfg,
            super_k=0, super_packed_k=0, super_packed_m=0,
            super_packed_off=0, super_live_k=0, super_faces=(),
            super_packed_e=0, super_loose_face=-1,
            budget=dataclasses.replace(
                cfg.budget,
                max_point_tri_contacts=4 * cfg.budget.max_point_tri_contacts,
            ),
            allpairs_broadphase_max=1 << 20,
        )

    @staticmethod
    def _contact_set(out):
        idx, mask = np.asarray(out[0]), np.asarray(out[1]) > 0
        return {tuple(int(v) for v in r) for r in idx[mask]}

    def test_contact_sets_match_exact(self):
        # Evolve WITH the super path; at sampled states the super contact
        # set must equal the exact all-pairs sweep's (as sets of
        # (corner, tri) tuples — multiplicity is documented divergence).
        from functools import partial

        from pies_tpu.solver.step import tick as tick_fn

        s = self._mixed()
        cfg, topo, params = s._config, s._topology, s.current_params()
        cfg_ref = self._exact_cfg(cfg)
        state = s._state
        h = float(params.dt)
        det_sup = jax.jit(partial(
            detect_point_tri_collisions,
            triangles=topo.triangles, tri_mask=topo.tri_mask, config=cfg,
            corners=topo.super_corners, adj=topo.super_adj,
        ))
        det_ref = jax.jit(partial(
            detect_point_tri_collisions,
            triangles=topo.triangles, tri_mask=topo.tri_mask, config=cfg_ref,
        ))
        checked = 0
        for i in range(40):
            state, _ = tick_fn(state, topo, params, cfg)
            assert not bool(state.sim_failed)
            if i % 5:
                continue
            x = state.positions + h * state.velocities * state.node_mask[:, None]
            sup = det_sup(x, state.prev_positions, params=params)
            ref = det_ref(x, state.prev_positions, params=params)
            assert self._contact_set(sup) == self._contact_set(ref)
            checked += 1
        assert checked >= 8

    def test_cached_matches_uncached(self):
        # The temporal cache on the super path must never change contacts.
        from functools import partial

        from pies_tpu.solver.step import tick as tick_fn

        s = self._mixed()
        cfg, topo, params = s._config, s._topology, s.current_params()
        assert s._state.bp is not None  # super scenes get a cache
        state = s._state
        h = float(params.dt)
        det = jax.jit(partial(
            detect_point_tri_collisions,
            triangles=topo.triangles, tri_mask=topo.tri_mask, config=cfg,
            corners=topo.super_corners, adj=topo.super_adj,
        ))
        cache = state.bp
        for i in range(25):
            x = state.positions + h * state.velocities * state.node_mask[:, None]
            ia, ma, _, cache = det(
                x, state.prev_positions, params=params, cache=cache
            )
            ib, mb, _ = det(x, state.prev_positions, params=params)
            assert self._contact_set((ia, ma)) == self._contact_set((ib, mb))
            state, _ = tick_fn(state, topo, params, cfg)

    def test_pure_loose_scene(self):
        # A cloth-only scene (no packed prefix): every triangle is a loose
        # row; mesh adjacency keeps neighbors out; folding onto the floor
        # must stay stable and un-latched.
        n = 10
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True,
                   allpairs_broadphase_max=0)
        sx = np.linspace(0.0, 4.0, n, dtype=np.float32)
        gx, gz = np.meshgrid(sx, sx, indexing="ij")
        pts = np.stack([gx, np.full_like(gx, 1.0), gz], -1).reshape(-1, 3)
        ids = s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.2)
        g = ids.reshape(n, n)
        pairs = np.concatenate([
            np.stack([g[:-1, :].ravel(), g[1:, :].ravel()], 1),
            np.stack([g[:, :-1].ravel(), g[:, 1:].ravel()], 1),
            np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel()], 1),
        ])
        s._builder._emit_distance(pairs, 4000.0)
        tris = np.concatenate([
            np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(),
                      g[1:, 1:].ravel()], 1),
            np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(),
                      g[:-1, 1:].ravel()], 1),
        ])
        # One body id per triangle -> no packed prefix.
        s._builder._emit_triangles(tris)
        s._dirty = True
        s._prepare()
        cfg = s._config
        assert cfg.super_k > 0 and cfg.super_packed_k == 0
        for _ in range(60):
            s.tick()
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        assert p[:, 1].min() > -0.1
