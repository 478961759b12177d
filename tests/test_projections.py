"""Fidelity tests: batched constraint projections vs. the NumPy oracle.

Each test builds a random batch, runs the TPU kernel, and checks it
constraint-by-constraint against the scalar transcription of the reference
formulas (SURVEY §4 'fidelity tests vs a reference implementation')."""

import numpy as np

import jax.numpy as jnp

from pies_tpu import topology as topo_mod
from pies_tpu.constraints import projections as proj
from pies_tpu.collision import batches as coll

import oracle


def rand_positions(n, seed, scale=2.0):
    return (
        scale * np.random.default_rng(seed).standard_normal((n, 3))
    ).astype(np.float32)


class TestDistance:
    def test_matches_oracle(self):
        n = 32
        x = rand_positions(n, 0)
        rng = np.random.default_rng(1)
        idx = rng.integers(0, n, size=(16, 2)).astype(np.int32)
        idx[:, 1] = (idx[:, 0] + 1 + idx[:, 1] % (n - 1)) % n  # distinct
        batch = topo_mod.build_distance(idx, x, 0.7)
        # Perturb so rest != current
        x2 = x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
        got = np.asarray(proj.project_distance(jnp.asarray(x2), batch))
        for c in range(16):
            want = oracle.distance_project(
                x2[idx[c, 0]], x2[idx[c, 1]], np.asarray(batch.rest)[c]
            )
            np.testing.assert_allclose(got[c], want, atol=1e-5)

    def test_degenerate_direction(self):
        x = np.zeros((2, 3), np.float32)
        batch = topo_mod.build_distance(
            np.array([[0, 1]], np.int32), np.array([[0, 0, 0], [1, 0, 0]], np.float32), 1.0
        )
        got = np.asarray(proj.project_distance(jnp.asarray(x), batch))
        # dist=0 -> dir=(1,0,0), disp=rest=1 -> proj0 = (−1,0,0)
        np.testing.assert_allclose(got[0, 0], [-1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(got[0, 1], [0, 0, 0], atol=1e-6)


class TestTets:
    def _make(self, seed, n_tets=24):
        rng = np.random.default_rng(seed)
        n = n_tets * 4
        x = np.zeros((n, 3), np.float32)
        idx = np.arange(n).reshape(n_tets, 4).astype(np.int32)
        for t in range(n_tets):
            base = rng.standard_normal(3)
            x[idx[t, 0]] = base
            # Non-degenerate tets
            x[idx[t, 1]] = base + [1, 0, 0] + 0.1 * rng.standard_normal(3)
            x[idx[t, 2]] = base + [0, 1, 0] + 0.1 * rng.standard_normal(3)
            x[idx[t, 3]] = base + [0, 0, 1] + 0.1 * rng.standard_normal(3)
        return x.astype(np.float32), idx

    def test_strain_matches_oracle(self):
        x, idx = self._make(2)
        batch = topo_mod.build_tets(idx, x, 1.0, 0.8, 1.0)
        rng = np.random.default_rng(3)
        # Deform: squash + stretch + a few inverted tets
        x2 = x * np.array([1.6, 0.5, 1.0], np.float32)
        x2[idx[::5, 1]] = x[idx[::5, 0]] * 2 - x[idx[::5, 1]]  # invert some
        got = np.asarray(proj.project_strain(jnp.asarray(x2), batch))
        qinv = np.asarray(batch.qinv).T.reshape(-1, 3, 3)
        for t in range(idx.shape[0]):
            want = oracle.tet_strain_project(x2[idx[t]], qinv[t], 0.8, 1.0)
            np.testing.assert_allclose(got[t], want, atol=3e-4, rtol=1e-3)

    def test_volume_matches_oracle(self):
        x, idx = self._make(4)
        batch = topo_mod.build_tets(idx, x, 1.0, 1.0, 1.0)
        x2 = x * np.array([1.3, 0.7, 1.1], np.float32)
        got = np.asarray(proj.project_volume(jnp.asarray(x2), batch))
        qinv = np.asarray(batch.qinv).T.reshape(-1, 3, 3)
        for t in range(idx.shape[0]):
            want = oracle.tet_volume_project(x2[idx[t]], qinv[t], 1.0, 1.0)
            np.testing.assert_allclose(got[t], want, atol=3e-4, rtol=1e-3)

    def test_strain_identity_when_undeformed(self):
        x, idx = self._make(5)
        batch = topo_mod.build_tets(idx, x, 1.0, 0.8, 1.0)
        got = np.asarray(proj.project_strain(jnp.asarray(x), batch))
        # Undeformed: F = P·Qinv = I, σ̂ = clamp(1) = 1 → F̂ = I, so the
        # projected configuration rows 1..3 are F̂'s columns = unit vectors
        # (the PD energy compares F against F̂, not positions directly).
        eye = np.eye(3, dtype=np.float32)
        for t in range(idx.shape[0]):
            np.testing.assert_allclose(got[t, 1:], eye.T, atol=2e-4)
            np.testing.assert_allclose(got[t, 0], 0.0, atol=1e-6)


class TestBend:
    def test_matches_oracle(self):
        rng = np.random.default_rng(6)
        n_c = 12
        x = rand_positions(n_c * 4, 7, scale=1.0)
        idx = np.arange(n_c * 4).reshape(n_c, 4).astype(np.int32)
        inv_mass = rng.uniform(0.5, 2.0, n_c * 4).astype(np.float32)
        batch = topo_mod.build_bend(idx, x, 1.0)
        x2 = x + 0.2 * rng.standard_normal(x.shape).astype(np.float32)
        got = np.asarray(
            proj.project_bend(jnp.asarray(x2), jnp.asarray(inv_mass), batch)
        )
        rest = np.asarray(batch.rest_angle)
        for c in range(n_c):
            want = oracle.bend_project(x2[idx[c]], inv_mass[idx[c]], rest[c])
            np.testing.assert_allclose(got[c], want, atol=2e-4, rtol=1e-3)


class TestShapeMatching:
    def test_matches_oracle(self):
        rng = np.random.default_rng(8)
        ids = np.arange(9, dtype=np.int32)
        x = rand_positions(9, 9, scale=1.0)
        inv_mass = rng.uniform(0.5, 2.0, 9).astype(np.float32)
        batch = topo_mod.build_groups(
            [(ids, x)], np.array([1.0], np.float32), inv_mass, kind="shape"
        )
        # Rotate + deform
        theta = 0.6
        rot = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        x2 = (x @ rot.T + 0.05 * rng.standard_normal((9, 3))).astype(np.float32)
        q0 = jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))
        mass = jnp.asarray(1.0 / inv_mass)
        got, q_new = proj.project_shape(
            jnp.asarray(x2), mass, q0, batch, rotation_iterations=100
        )
        got = np.asarray(got)

        mats = np.asarray(batch.mat_coords)[:9]  # strip member padding
        want, _ = oracle.shape_matching_project(
            x2, ids, mats, inv_mass, np.array([1.0, 0, 0, 0])
        )
        np.testing.assert_allclose(got[:9], want, atol=2e-3)

    def test_goal_matching(self):
        x = rand_positions(6, 10)
        ids = np.arange(6, dtype=np.int32)
        batch = topo_mod.build_groups(
            [(ids, x)], np.array([1.0], np.float32), np.ones(6), kind="goal"
        )
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [1.0, 2.0, 3.0]
        t[:3, :3] = oracle.quat_to_mat(
            np.array([np.cos(0.3), 0, np.sin(0.3), 0])
        ).astype(np.float32)
        import dataclasses

        batch = dataclasses.replace(
            batch, transforms=jnp.asarray(t[None].repeat(batch.w.shape[0], 0))
        )
        got = np.asarray(proj.project_goal(batch))
        want = oracle.goal_project(x, t)
        np.testing.assert_allclose(got[:6], want, atol=1e-5)


class TestCollisionProjections:
    def test_point_tri(self):
        rng = np.random.default_rng(11)
        x = rand_positions(16, 12)
        idx = np.arange(16).reshape(4, 4).astype(np.int32)
        got_p, got_delta = coll.project_point_tri(
            jnp.asarray(x), jnp.asarray(idx), jnp.float32(0.05)
        )
        got_p, got_delta = np.asarray(got_p), np.asarray(got_delta)
        for k in range(4):
            want = oracle.point_tri_project(x[idx[k]], 0.05)
            np.testing.assert_allclose(got_p[k], want, atol=1e-5)
            # delta is the point's displacement; other rows don't move.
            np.testing.assert_allclose(
                got_delta[k], want[0] - x[idx[k, 0]], atol=1e-5
            )

    def test_static_floor_quirk(self):
        x = np.array([[1.0, -0.5, 2.0], [1.0, 0.5, 2.0]], np.float32)
        idx = np.array([0, 1], np.int32)
        got = np.asarray(
            coll.project_static(
                jnp.asarray(x), jnp.asarray(idx), jnp.float32(3.0), True
            )
        )
        # Quirk: clamps to y=0, ignoring floor_height=3 (CollisionConstraint.cpp:452)
        np.testing.assert_allclose(got[0], [1.0, 0.0, 2.0])
        np.testing.assert_allclose(got[1], [1.0, 0.5, 2.0])
