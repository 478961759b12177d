"""Observability tests: residual decay (SURVEY §4 integration level),
stats snapshot, ensemble rollout (BASELINE config 5), edge-edge CCD."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pies_tpu as pt
from pies_tpu import Solver, diagnostics, topology as T
from pies_tpu.options import SolverName, SolverOptions, StepConfig, make_params
from pies_tpu.parallel import ensemble
from pies_tpu.collision.narrowphase import edge_edge_ccd


class TestResiduals:
    def test_cloth_residual_decays(self):
        # Integration-level check (SURVEY §4): constraint residuals decay as
        # the hanging cloth settles.
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_sheet((0.0, 8.0, 0.0), 1.0, 1.0, w=2000.0)
        s.tick()
        early = diagnostics.solver_stats(s)
        for _ in range(120):
            s.tick()
        late = diagnostics.solver_stats(s)
        # The sheet stretches when released, then the solver keeps the
        # distance error bounded as it swings (damping 0.006 is underdamped,
        # so speeds legitimately oscillate for a long time).
        assert np.isfinite(early["max_speed"])
        assert late["distance"] < 0.1
        assert late["position"] < 0.05
        assert not late["sim_failed"]
        assert late["steps_per_sec"] > 0

    def test_strain_volume_residuals_at_rest(self):
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_tet_box((0.0, 5.0, 0.0), 1.0, (0, 0, 0), w=2000.0, mass=1.0)
        s._prepare()
        r = diagnostics.constraint_residuals(s.state, s.topology)
        # Undeformed at creation: zero strain/volume violation.
        assert float(r["strain"]) < 1e-5
        assert float(r["volume"]) < 1e-4


class TestEnsembleRollout:
    def test_64_scene_rollout(self):
        # BASELINE config 5's ensemble half: 64 scenes, vmapped, sharded
        # across the virtual 8-device mesh.
        n = 8
        pos = np.stack(
            [np.arange(n) * 0.5, np.full(n, 6.0), np.zeros(n)], 1
        ).astype(np.float32)
        pairs = np.stack([np.arange(1, n), np.arange(n - 1)], 1)
        state = pt.make_state(pos, radius=np.full(n, 0.2, np.float32))
        topo = T.assemble_topology(
            state.capacity,
            distance=T.build_distance(pairs, pos, 2000.0),
            position=T.build_position(np.array([0]), pos, 2000.0),
        )
        cfg = StepConfig(solver=SolverName.PD, enable_collisions=False)
        params = make_params(SolverOptions())

        mesh = ensemble.make_mesh()
        batched = ensemble.shard_ensemble(
            ensemble.stack_ensemble(state, 64), mesh
        )
        step = ensemble.make_sharded_step(mesh, cfg)
        for _ in range(10):
            batched, max_res, failed = step(batched, topo, params)
        assert int(failed) == 0
        p = np.asarray(batched.positions)
        assert p.shape[0] == 64
        assert np.all(np.isfinite(p))
        np.testing.assert_allclose(p[0], p[63], atol=1e-6)


class TestEdgeEdgeCCD:
    def _args(self, a, b, c, d, a1, b1, c1, d1):
        # Convert endpoints to the relative form the CCD takes.
        f = lambda v: jnp.asarray(np.asarray(v, np.float32)[None])
        return (
            f(np.subtract(b, a)), f(np.subtract(c, a)), f(np.subtract(d, a)),
            f(np.subtract(b1, a1)), f(np.subtract(c1, a1)), f(np.subtract(d1, a1)),
        )

    def test_crossing_edges_hit(self):
        # Edge cd sweeps down through edge ab.
        args = self._args(
            [-1, 0, 0], [1, 0, 0], [0, 1, -1], [0, 1, 1],
            [-1, 0, 0], [1, 0, 0], [0, -1, -1], [0, -1, 1],
        )
        hit, t = edge_edge_ccd(*args, quirk=False)
        assert bool(np.asarray(hit)[0])
        np.testing.assert_allclose(float(np.asarray(t)[0]), 0.5, atol=0.05)

    def test_far_edges_miss(self):
        args = self._args(
            [-1, 0, 0], [1, 0, 0], [5, 1, -1], [5, 1, 1],
            [-1, 0, 0], [1, 0, 0], [5, 0.5, -1], [5, 0.5, 1],
        )
        hit, _ = edge_edge_ccd(*args, quirk=False)
        assert not bool(np.asarray(hit)[0])

    def test_quirk_mode_misses_midsegment_proximity(self):
        # The reference's u/v shadowing bug (CollisionDetection.cpp:328-329)
        # evaluates the proximity check at u = v = 0, i.e. it measures
        # |c − a| instead of the true closest distance.  Two static edges
        # crossing mid-segment 0.3 apart (< the 0.5 proximity thickness) but
        # with far-apart start points: the fixed math reports the proximity
        # hit, quirk mode misses it entirely.
        args = self._args(
            [0, 0, 0], [10, 0, 0], [5, 0.3, -5], [5, 0.3, 5],
            [0, 0, 0], [10, 0, 0], [5, 0.3, -5], [5, 0.3, 5],
        )
        hit_quirk, _ = edge_edge_ccd(*args, quirk=True)
        hit_fixed, t_fixed = edge_edge_ccd(*args, quirk=False)
        assert not bool(np.asarray(hit_quirk)[0])
        assert bool(np.asarray(hit_fixed)[0])
        assert float(np.asarray(t_fixed)[0]) == 1.0


class TestBudgetObservability:
    def test_budget_cliff_visible(self):
        # Drive a scene to the contact-budget cliff: the static contact
        # buffer saturates, the excess drops GRACEFULLY (no latch), and the
        # occupancy counters make the cliff visible (VERDICT round-2 #8 —
        # "overflow is graceful but invisible until it latches").
        from pies_tpu.options import CollisionBudget

        s = Solver(
            SolverOptions(solver=SolverName.PD),
            enable_collisions=True,
            budget=CollisionBudget(
                max_cells_per_tri=32,
                max_entries_per_cell=32,
                max_candidates_per_tri=96,
                max_narrow_candidates=16,
                max_point_tri_contacts=8,
            ),
        )
        # Overlapping tet soup: spacing below the tet size forces many
        # point-triangle proximity hits immediately.  The health counters
        # read the LAST substep's buffers and the compressed soup relaxes
        # chaotically, so assert on the max across ticks (which tick
        # saturates is trajectory-sensitive at f32).
        s.create_tet_soup(12, spacing=0.9, scale=0.8, w=2000.0, height=0.3)
        max_contact_occ, max_cand_occ = 0.0, 0.0
        for _ in range(6):
            s.tick()
            h = diagnostics.broadphase_health(s)
            max_contact_occ = max(max_contact_occ, float(h["pt_contact_occupancy"]))
            max_cand_occ = max(max_cand_occ, float(h["candidate_occupancy"]))
        assert not s.sim_failed  # graceful drop, no latch
        assert h["pt_contact_cap"] == 8
        assert max_contact_occ == 1.0  # the cliff, visible
        assert h["candidate_count_max"] >= 1
        # Occupancy > 1 means demand EXCEEDS the candidate budget (the
        # overflow factor); this compressed soup should overshoot it.
        assert max_cand_occ > 1.0
