"""Multi-chip tests on the virtual 8-device CPU mesh: ensemble vmap
equivalence and the shard_map step with cross-device reductions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pies_tpu as pt
from pies_tpu import topology as T
from pies_tpu.options import SolverName, SolverOptions, StepConfig, make_params
from pies_tpu.parallel import ensemble
from pies_tpu.solver.step import tick


def rope_scene(n=12, w=2000.0):
    pos = np.stack(
        [np.arange(n) * 0.5, np.full(n, 8.0), np.zeros(n)], 1
    ).astype(np.float32)
    pairs = np.stack([np.arange(1, n), np.arange(n - 1)], 1)
    state = pt.make_state(pos, radius=np.full(n, 0.2, np.float32))
    topo = T.assemble_topology(
        state.capacity,
        distance=T.build_distance(pairs, pos, w),
        position=T.build_position(np.array([0]), pos, w),
    )
    return state, topo


class TestEnsemble:
    def test_vmap_matches_single(self):
        state, topo = rope_scene()
        cfg = StepConfig(solver=SolverName.PD, enable_collisions=False)
        params = make_params(SolverOptions())

        batched = ensemble.stack_ensemble(state, 4)
        for _ in range(10):
            batched, _ = ensemble.ensemble_tick(batched, topo, params, cfg)
            state, _ = tick(state, topo, params, cfg)
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(batched.positions)[i],
                np.asarray(state.positions),
                atol=1e-6,
            )

    def test_tick_n_matches_tick_loop(self):
        """ensemble_tick_n (one-dispatch scan) == n ensemble_tick calls."""
        state, topo = rope_scene()
        cfg = StepConfig(solver=SolverName.PD, enable_collisions=False)
        params = make_params(SolverOptions())

        looped = ensemble.stack_ensemble(state, 3)
        for _ in range(6):
            looped, res_l = ensemble.ensemble_tick(looped, topo, params, cfg)
        batched, res_n = ensemble.ensemble_tick_n(
            ensemble.stack_ensemble(state, 3), topo, params, cfg, 6
        )
        np.testing.assert_allclose(
            np.asarray(batched.positions),
            np.asarray(looped.positions),
            atol=0.0,
        )
        np.testing.assert_allclose(
            float(res_n), float(jnp.max(res_l)), atol=0.0
        )

    def test_sharded_step_runs_on_mesh(self):
        n_dev = len(jax.devices())
        assert n_dev == 8, "conftest should provide 8 virtual devices"
        mesh = ensemble.make_mesh()
        state, topo = rope_scene()
        cfg = StepConfig(solver=SolverName.PD, enable_collisions=False)
        params = make_params(SolverOptions())

        batched = ensemble.stack_ensemble(state, n_dev * 2)
        batched = ensemble.shard_ensemble(batched, mesh)
        step = ensemble.make_sharded_step(mesh, cfg)
        for _ in range(5):
            batched, max_res, num_failed = step(batched, topo, params)
        assert int(num_failed) == 0
        assert np.isfinite(float(max_res))
        p = np.asarray(batched.positions)
        assert p.shape[0] == n_dev * 2
        # All members identical (same scene), and sharding preserved.
        np.testing.assert_allclose(p[0], p[-1], atol=1e-6)
        assert len(batched.positions.sharding.device_set) == n_dev

    def test_sharded_matches_unsharded(self):
        mesh = ensemble.make_mesh()
        state, topo = rope_scene()
        cfg = StepConfig(solver=SolverName.PD, enable_collisions=False)
        params = make_params(SolverOptions())

        b1 = ensemble.stack_ensemble(state, 8)
        b2 = ensemble.shard_ensemble(ensemble.stack_ensemble(state, 8), mesh)
        step = ensemble.make_sharded_step(mesh, cfg)
        for _ in range(5):
            b1, _ = ensemble.ensemble_tick(b1, topo, params, cfg)
            b2, _, _ = step(b2, topo, params)
        np.testing.assert_allclose(
            np.asarray(b1.positions), np.asarray(b2.positions), atol=1e-5
        )


class TestGraftEntry:
    def test_entry_compiles(self):
        import importlib.util, pathlib

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__",
            pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        leaves = jax.tree_util.tree_leaves(out)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves if l.dtype.kind == "f")

    def test_dryrun_multichip(self):
        import importlib.util, pathlib

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__",
            pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)


class TestDomainDecomposition:
    """Spatial slab sharding (parallel/domain.py): a sharded scene must track
    the single-device trajectory to f32 summation-order noise."""

    def _compare(
        self,
        build,
        n_slabs,
        ticks,
        atol,
        enable_collisions=False,
        collision_margin=0.0,
        require_contacts=False,
        options=None,
        **solver_kwargs,
    ):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pies_tpu import Solver
        from pies_tpu.parallel.domain import (
            gather_positions,
            make_domain_tick,
            partition_domain,
        )

        opts = options or SolverOptions(solver=SolverName.PD)
        s = Solver(
            opts,
            enable_collisions=enable_collisions,
            **solver_kwargs,
        )
        build(s)
        s._prepare()
        state0 = jax.tree_util.tree_map(np.asarray, s._state)
        topo0 = jax.tree_util.tree_map(np.asarray, s._topology)
        params = s.current_params()
        config = s._config
        n_live = s._builder.num_nodes

        saw_contacts = False
        for _ in range(ticks):
            s.tick()
            if require_contacts and not saw_contacts:
                from pies_tpu.solver.step import default_detect_collisions

                c = default_detect_collisions(
                    s._state, s._state.positions, s._topology, params, config
                )
                saw_contacts = bool(np.sum(np.asarray(c.pt_mask)) > 0)
        ref = s.get_vertices()["position"][:n_live]
        assert not s.sim_failed
        if require_contacts:
            assert saw_contacts, "scene never produced point-tri contacts"

        dom = partition_domain(
            state0, topo0, n_slabs=n_slabs, collision_margin=collision_margin
        )
        mesh = ensemble.make_mesh(n_slabs, axis="x")
        sh = NamedSharding(mesh, P("x"))
        put = lambda a: jax.device_put(jnp.asarray(a), sh)
        dstate = jax.tree_util.tree_map(put, dom.state)
        dstatic = jax.tree_util.tree_map(put, dom.static)
        dtick = make_domain_tick(mesh, config, dom.meta)

        # Single-tick parity is the provable statement: one domain tick
        # from the same state must match the single-device tick to f32
        # summation-order noise (contact sets identical, same math).  Over
        # long contact-active horizons the psum-vs-flat-sum rounding
        # difference (~1e-7/tick) amplifies chaotically through the stiff
        # contact dynamics, so the trajectory bound is necessarily looser.
        s2 = Solver(
            opts,
            enable_collisions=enable_collisions,
            **solver_kwargs,
        )
        build(s2)
        s2._prepare()
        s2.tick()
        dstate, _ = dtick(dstate, dstatic, params)
        one = np.abs(
            gather_positions(dom, dstate)[:n_live]
            - s2.get_vertices()["position"][:n_live]
        ).max()
        assert one < 1e-5, f"single-tick domain parity broken: {one}"

        for _ in range(ticks - 1):
            dstate, res = dtick(dstate, dstatic, params)
        assert not bool(np.any(np.asarray(dstate.sim_failed)))
        got = gather_positions(dom, dstate)[:n_live]
        err = np.abs(got - ref).max()
        assert err < atol, f"domain trajectory diverged: {err}"
        return err

    def test_rope_two_slabs_matches_single_device(self):
        self._compare(
            lambda s: s.create_rope((0, 8, 0), (6, 8, 0), 64, w=10000.0),
            n_slabs=2, ticks=30, atol=1e-4,
        )

    def test_tet_boxes_floor_four_slabs(self):
        def build(s):
            for i in range(4):
                s.create_tet_box(
                    (3.0 * i, 2.0, 0.0), 1.0, (0, 0, 0), w=1500.0, mass=1.0
                )

        self._compare(build, n_slabs=4, ticks=40, atol=1e-4)

    def test_shape_matching_eight_slabs(self):
        def build(s):
            for i in range(8):
                s.create_shape_matching_box(
                    (2.0 * i, 1.5, 0.0), 3, 3, 3, 0.5, (0, 0, 0), w=500.0
                )

        self._compare(build, n_slabs=8, ticks=25, atol=1e-4)

    def test_two_slab_pile_with_collisions(self):
        # Two tet boxes falling into mutual + floor contact with the contact
        # zone straddling the slab boundary: the domain-sharded dynamic
        # collision pipeline (owned-triangle emission, halo-reduced contact
        # scatters/stabilization/friction) must track the single device.
        def build(s):
            # Two colliding pairs; the second pair pads the node count so
            # the collision halo (every node within `collision_margin` of
            # the slab boundary) fits inside a block.
            for x0 in (0.0, 4.5):
                s.create_tet_box(
                    (x0, 1.2, 0.0), 1.0, (0, 0, 0), w=1500.0, mass=1.0
                )
                s.create_tet_box(
                    (x0 + 1.4, 2.6, 0.0), 1.0, (0, 0, 0), w=1500.0, mass=1.0
                )

        # The tight parity statement is the single-tick check inside
        # _compare (1e-5).  This trajectory bound is a stability check
        # only: the scene is in stiff contact (w = 1e4) from tick 1, and
        # the psum-vs-flat rounding difference amplifies ~10x over the
        # first few contact ticks (measured: 2e-6 after one tick, ~1e-3
        # after five, saturating ~3e-3 by tick 45).  Contact-free
        # trajectories in the other tests stay at 1e-4.
        self._compare(
            build,
            n_slabs=2,
            ticks=45,
            atol=2e-2,
            enable_collisions=True,
            collision_margin=1.3,
            require_contacts=True,
        )

    def test_domain_edge_edge_collisions(self):
        # Crossing wireframe strips with the contact pair straddling the
        # slab boundary: the domain edge-edge sweep (owned lower-id query
        # emission, halo-reduced diag/force/stabilization) must track the
        # single-device tick.  Two strip pairs spread along x so each slab
        # owns one, plus the boundary-straddling middle pair.
        def build(s):
            b = s._builder
            for x0 in (0.0, 3.0, 6.0):
                b._emit_nodes(
                    np.array(
                        [[x0 - 1, 1, 0], [x0 + 1, 1, 0], [x0, 2.5, 0]],
                        np.float32,
                    ),
                    inv_mass=1.0, radius=0.1,
                )
                b._emit_nodes(
                    np.array(
                        [[x0, 1.02, -1], [x0, 1.02, 1], [x0, 2.5, 0.8]],
                        np.float32,
                    ),
                    inv_mass=1.0, radius=0.1,
                )
            tris = np.arange(18, dtype=np.int32).reshape(6, 3)
            for t in tris:
                b.triangles.append(t[None, :])
            s._dirty = True

        self._compare(
            build,
            n_slabs=2,
            ticks=10,
            atol=1e-3,
            enable_collisions=False,
            collision_margin=2.5,
            options=SolverOptions(solver=SolverName.PD, gravity=0.0),
            enable_edge_collisions=True,
            reference_quirks=False,
        )

    def test_domain_node_node_collisions(self):
        # A line of overlapping PD spheres spanning both slabs: pair
        # (i < j) emits from its owned lower node, diag/force/friction
        # accumulators halo-reduce — trajectory must match single-device.
        from pies_tpu.options import CollisionBudget

        def build(s):
            xs = np.arange(64, dtype=np.float32) * 0.5
            pts = np.stack(
                [xs, np.full(64, 5.0, np.float32), np.zeros(64, np.float32)],
                axis=1,
            )
            s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.3)
            s._dirty = True

        self._compare(
            build,
            n_slabs=2,
            ticks=15,
            atol=1e-3,
            enable_collisions=False,
            collision_margin=4.0,
            options=SolverOptions(
                solver=SolverName.PD, gravity=0.0, iterations=8,
                collision_stabilization_iterations=0,
            ),
            enable_node_collisions=True,
            cg_iterations=32,
            cg_rtol=0.0,
            # The line scene has ~274 grid-sharing pairs; the default
            # 256-pair budget makes the SINGLE device drop 18 of them
            # (graceful degradation) while the two per-slab buffers keep
            # all — parity needs both sides unclipped.
            budget=CollisionBudget(max_node_node_contacts=512),
        )

    def test_halo_too_small_raises(self):
        from pies_tpu import Solver
        from pies_tpu.parallel.domain import partition_domain

        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.create_rope((0, 8, 0), (6, 8, 0), 64, w=10000.0)
        s._prepare()
        state0 = jax.tree_util.tree_map(np.asarray, s._state)
        topo0 = jax.tree_util.tree_map(np.asarray, s._topology)
        with pytest.raises(ValueError):
            partition_domain(state0, topo0, n_slabs=2, halo=0)
