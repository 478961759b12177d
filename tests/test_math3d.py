"""Unit tests for the batched 3x3 linear algebra (SVD, rotation extraction)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pies_tpu.ops import math3d

import oracle


def random_mats(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return (scale * rng.standard_normal((n, 3, 3))).astype(np.float32)


class TestDetInv:
    def test_det(self):
        m = random_mats(64, 0)
        np.testing.assert_allclose(
            np.asarray(math3d.det3x3(jnp.asarray(m))),
            np.linalg.det(m),
            rtol=2e-4,
            atol=2e-4,
        )

    def test_inv(self):
        m = random_mats(64, 1) + 2 * np.eye(3, dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(math3d.inv3x3(jnp.asarray(m))),
            np.linalg.inv(m),
            rtol=2e-3,
            atol=2e-3,
        )


class TestSVD:
    def _check(self, f, atol=2e-4):
        u, s, v = math3d.svd3x3(jnp.asarray(f))
        u, s, v = np.asarray(u), np.asarray(s), np.asarray(v)
        # Reconstruction
        rec = np.einsum("cij,cj,ckj->cik", u, s, v)
        np.testing.assert_allclose(rec, f, atol=atol * np.abs(f).max())
        # Orthogonality
        eye = np.broadcast_to(np.eye(3), u.shape)
        np.testing.assert_allclose(
            np.einsum("cji,cjk->cik", u, u), eye, atol=5e-4
        )
        np.testing.assert_allclose(
            np.einsum("cji,cjk->cik", v, v), eye, atol=5e-4
        )
        # Singular values: non-negative, descending, match numpy
        s_ref = np.linalg.svd(f.astype(np.float64), compute_uv=False)
        assert np.all(s >= -1e-6)
        assert np.all(np.diff(s, axis=-1) <= 1e-5)
        np.testing.assert_allclose(s, s_ref, atol=2e-4 * max(1, np.abs(f).max()))

    def test_generic(self):
        self._check(random_mats(128, 2))

    def test_near_rotation(self):
        rng = np.random.default_rng(3)
        q, _ = np.linalg.qr(rng.standard_normal((64, 3, 3)))
        self._check(q.astype(np.float32))

    def test_inverted(self):
        f = random_mats(64, 4)
        f[:, :, 0] *= -1  # force many negative determinants
        self._check(f)

    def test_rank_deficient(self):
        f = random_mats(32, 5)
        f[:, :, 2] = f[:, :, 0]  # rank 2
        u, s, v = math3d.svd3x3(jnp.asarray(f))
        rec = np.einsum("cij,cj,ckj->cik", np.asarray(u), np.asarray(s), np.asarray(v))
        np.testing.assert_allclose(rec, f, atol=2e-3)
        assert np.all(np.asarray(s)[:, 2] < 1e-3)

    def test_scaled(self):
        self._check(random_mats(64, 6, scale=100.0), atol=5e-4)
        self._check(random_mats(64, 7, scale=0.01), atol=5e-4)


class TestRotationExtraction:
    def test_matches_oracle(self):
        rng = np.random.default_rng(8)
        a = (np.eye(3) + 0.3 * rng.standard_normal((16, 3, 3))).astype(
            np.float32
        )
        q0 = np.zeros((16, 4), np.float32)
        q0[:, 0] = 1.0
        got = np.asarray(
            math3d.extract_rotation(jnp.asarray(a), jnp.asarray(q0), 100)
        )
        for i in range(16):
            want = oracle.extract_rotation(a[i], q0[i], 100)
            # Quaternion sign ambiguity: compare rotation matrices.
            np.testing.assert_allclose(
                np.asarray(math3d.quat_to_mat(jnp.asarray(got[i]))),
                oracle.quat_to_mat(want),
                atol=5e-4,
            )

    def test_exact_rotation_recovered(self):
        rng = np.random.default_rng(9)
        q, _ = np.linalg.qr(rng.standard_normal((8, 3, 3)))
        q *= np.sign(np.linalg.det(q))[:, None, None]  # proper rotations
        q0 = np.zeros((8, 4), np.float32)
        q0[:, 0] = 1.0
        got = math3d.extract_rotation(
            jnp.asarray(q.astype(np.float32)), jnp.asarray(q0), 60
        )
        r = np.asarray(math3d.quat_to_mat(got))
        np.testing.assert_allclose(r, q, atol=2e-3)


class TestQuat:
    def test_mul_matches_matrix_product(self):
        rng = np.random.default_rng(10)
        a = rng.standard_normal((8, 4)).astype(np.float32)
        b = rng.standard_normal((8, 4)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        ab = math3d.quat_mul(jnp.asarray(a), jnp.asarray(b))
        r_ab = np.asarray(math3d.quat_to_mat(ab))
        r_a = np.asarray(math3d.quat_to_mat(jnp.asarray(a)))
        r_b = np.asarray(math3d.quat_to_mat(jnp.asarray(b)))
        np.testing.assert_allclose(r_ab, r_a @ r_b, atol=1e-5)
