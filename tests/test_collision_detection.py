"""Unit tests: cubic root finding and point-triangle CCD vs the oracle."""

import numpy as np

import jax.numpy as jnp

from pies_tpu.ops.cubic import earliest_root_in_unit_interval
from pies_tpu.collision.narrowphase import point_triangle_ccd

import oracle


def run_cubic(coeffs):
    a, b, c, d = (jnp.asarray(np.array(v, np.float32)) for v in coeffs)
    t, found = earliest_root_in_unit_interval(a, b, c, d)
    return np.asarray(t), np.asarray(found)


class TestCubicRoots:
    def test_known_cubics(self):
        # (t-0.25)(t-0.5)(t-0.75) = t³ -1.5t² +0.6875t -0.09375
        cases = [
            ([1.0], [-1.5], [0.6875], [-0.09375], 0.25),
            # single real root in interval: t³ - 0.3 = 0 → t ≈ 0.6694
            ([1.0], [0.0], [0.0], [-0.3], 0.3 ** (1 / 3)),
        ]
        for a, b, c, d, expect in cases:
            t, found = run_cubic((a, b, c, d))
            assert found[()] if t.shape == () else found[0]
            np.testing.assert_allclose(t, expect, atol=1e-4)

    def test_no_root(self):
        t, found = run_cubic(([1.0], [0.0], [1.0], [5.0]))  # root < 0
        assert not found[0]

    def test_quadratic_path(self):
        # a == 0 exactly: (t-0.5)² = t² - t + 0.25
        t, found = run_cubic(([0.0], [1.0], [-1.0], [0.25]))
        assert found[0]
        np.testing.assert_allclose(t[0], 0.5, atol=1e-3)

    def test_quadratic_first_root_after_interval_quirk(self):
        # Roots at 1.5 and 2.5 with positive leading coeff: the reference
        # gives up when (−c−√)/2b > 1 (CollisionDetection.cpp:172-175).
        b, c, d = 1.0, -4.0, 3.75
        t, found = run_cubic(([0.0], [b], [c], [d]))
        assert not found[0]

    def test_linear_and_constant_paths(self):
        t, found = run_cubic(([0.0], [0.0], [2.0], [-1.0]))
        assert found[0] and abs(t[0] - 0.5) < 1e-6
        t, found = run_cubic(([0.0], [0.0], [0.0], [0.0]))
        assert found[0] and t[0] == 0.0
        t, found = run_cubic(([0.0], [0.0], [0.0], [1.0]))
        assert not found[0]

    def test_random_cubics_vs_numpy(self):
        rng = np.random.default_rng(0)
        coeffs = rng.standard_normal((256, 4)).astype(np.float32)
        t, found = run_cubic(
            (coeffs[:, 0], coeffs[:, 1], coeffs[:, 2], coeffs[:, 3])
        )
        for i in range(256):
            roots = np.roots(coeffs[i].astype(np.float64))
            valid = sorted(
                r.real
                for r in roots
                if abs(r.imag) < 1e-9 and 0.0 <= r.real <= 1.0
            )
            if valid:
                assert found[i], (i, coeffs[i], valid)
                np.testing.assert_allclose(t[i], valid[0], atol=2e-3)
            else:
                # Allow borderline roots just outside [0,1] at f32 precision.
                near = [
                    r.real
                    for r in roots
                    if abs(r.imag) < 1e-4 and -1e-3 <= r.real <= 1 + 1e-3
                ]
                assert not found[i] or near, (i, coeffs[i], roots)


class TestPointTriangleCCD:
    def _run(self, ap0, ab0, ac0, ap1, ab1, ac1, thr=0.1):
        args = [
            jnp.asarray(np.asarray(v, np.float32)[None]) for v in
            (ap0, ab0, ac0, ap1, ab1, ac1)
        ]
        hit, t = point_triangle_ccd(*args, jnp.float32(thr))
        return bool(np.asarray(hit)[0]), float(np.asarray(t)[0])

    def test_crossing_hit(self):
        # Point falls straight through the triangle plane.
        ab = np.array([1.0, 0.0, 0.0])
        ac = np.array([0.0, 0.0, 1.0])
        ap0 = np.array([0.25, 0.5, 0.25])
        ap1 = np.array([0.25, -0.5, 0.25])
        hit, t = self._run(ap0, ab, ac, ap1, ab, ac)
        assert hit
        np.testing.assert_allclose(t, 0.5, atol=1e-3)

    def test_crossing_outside_triangle(self):
        ab = np.array([1.0, 0.0, 0.0])
        ac = np.array([0.0, 0.0, 1.0])
        ap0 = np.array([2.5, 0.5, 2.5])  # outside barycentric range
        ap1 = np.array([2.5, -0.5, 2.5])
        hit, _ = self._run(ap0, ab, ac, ap1, ab, ac)
        assert not hit

    def test_proximity_hit_t0(self):
        ab = np.array([1.0, 0.0, 0.0])
        ac = np.array([0.0, 0.0, 1.0])
        n = np.cross(ab, ac)  # (0,-1,0)·|..| — points −y
        # Stay on the normal's positive side within the threshold.
        side = n / np.linalg.norm(n)
        ap0 = np.array([0.25, 0.0, 0.25]) + 0.5 * side
        ap1 = np.array([0.25, 0.0, 0.25]) + 0.05 * side
        hit, t = self._run(ap0, ab, ac, ap1, ab, ac)
        assert hit and t == 0.0

    def test_no_hit_far(self):
        ab = np.array([1.0, 0.0, 0.0])
        ac = np.array([0.0, 0.0, 1.0])
        ap0 = np.array([0.25, 5.0, 0.25])
        ap1 = np.array([0.25, 4.0, 0.25])
        hit, _ = self._run(ap0, ab, ac, ap1, ab, ac)
        assert not hit

    def test_random_vs_oracle(self):
        rng = np.random.default_rng(1)
        agree = 0
        total = 200
        for i in range(total):
            ab0, ac0 = rng.standard_normal((2, 3))
            ap0 = rng.standard_normal(3) * 0.5
            ap1 = ap0 + rng.standard_normal(3) * 0.8
            ab1 = ab0 + rng.standard_normal(3) * 0.1
            ac1 = ac0 + rng.standard_normal(3) * 0.1
            want = oracle.point_triangle_ccd(
                ap0, ab0, ac0, ap1, ab1, ac1, 0.1
            )
            hit, t = self._run(ap0, ab0, ac0, ap1, ab1, ac1)
            if hit == (want is not None):
                agree += 1
        # f32 closed-form vs f64 companion matrix: borderline cases may
        # differ; require near-total agreement.
        assert agree >= total * 0.97, f"only {agree}/{total} agree"


class TestCelllistOversizeCoverage:
    def test_mutually_oversize_pair_discovered(self):
        # Both items span (1, 2] cells on DIFFERENT axes, positioned so that
        # under single-corner insertion each one's home cell falls outside
        # the other's query window — the documented both-large miss case.
        # Two-corner insertion must discover the pair from both sides.
        import jax.numpy as jnp
        import pies_tpu as pt
        from pies_tpu.collision.broadphase import _celllist_candidates
        from pies_tpu.options import SolverName, SolverOptions, StepConfig, make_params

        pos = np.array(
            [
                # triangle A: x in [2.0,2.5], y in [0.2,2.05]  (tall in y)
                [2.0, 0.2, 0.0], [2.5, 1.0, 0.4], [2.2, 2.05, 0.2],
                # triangle B: x in [0.4,2.2], y in [2.02,2.5]  (long in x)
                [0.4, 2.02, 0.0], [2.2, 2.3, 0.4], [1.0, 2.5, 0.2],
            ],
            np.float32,
        )
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        state = pt.make_state(pos, capacity=8)
        full = jnp.asarray(
            np.concatenate([pos, np.asarray(state.positions)[6:]], 0)
        )
        params = make_params(SolverOptions(), broadphase_cell=1.0)
        cfg = StepConfig(solver=SolverName.PD)
        cand, cand_valid, lo, hi, margin, overflow = _celllist_candidates(
            full, full, jnp.asarray(tris),
            jnp.asarray(np.ones(2, np.float32)), params, cfg,
        )
        assert not bool(overflow)  # both items are within the 2-cell latch
        cand, cand_valid = np.asarray(cand), np.asarray(cand_valid)
        assert 1 in set(cand[0][cand_valid[0]])  # A discovers B
        assert 0 in set(cand[1][cand_valid[1]])  # B discovers A

    def test_oversize_counter_reports(self):
        from pies_tpu import Solver
        from pies_tpu import diagnostics
        from pies_tpu.options import SolverName, SolverOptions

        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        s.create_tet_soup(4, 1.6, 0.8, w=2000.0, height=2.0)
        health = diagnostics.broadphase_health(s)
        assert health["broadphase_latching_items"] == 0
        assert health["broadphase_oversize_items"] >= 0
