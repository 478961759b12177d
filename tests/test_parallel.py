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
