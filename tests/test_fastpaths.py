"""Fast-path gating guards (VERDICT r4 #6).

The performance-critical dispatch decisions are host-side static gates:
``tetcols.applies`` (the whole-iteration column fast path for disjoint-tet
scenes) and the super-body broadphase layout detection.  A silent gate
regression would not fail any physics test — the generic paths are
bit-compatible — it would just quadruple the headline tick.  These tests
pin the gates for the benchmark configurations.
"""

import numpy as np
import pytest

from pies_tpu import Solver
from pies_tpu.collision.batches import empty_collision_set
from pies_tpu.options import SolverName, SolverOptions
from pies_tpu.solver import tetcols


def _soup(n_tets=96, **kw):
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True,
               **kw)
    s.create_tet_soup(
        n_tets, spacing=1.6, scale=0.8, w=2000.0, height=0.5, jitter=0.05
    )
    return s


def _runtime_collision_shapes(s):
    """A CollisionSet with the shapes the runtime detection emits —
    ``tetcols.applies`` gates on static shapes only."""
    cap = int(s._state.capacity)
    colls = empty_collision_set(
        pt_cap=s._config.budget.max_point_tri_contacts,
        dense_floor_nodes=cap if s._config.dense_floor else 0,
    )
    return colls


def test_headline_soup_takes_tetcols_path():
    """The headline bench configuration (bench.py: create_tet_soup + PD +
    collisions) must take the tet-column fast path; a gate regression here
    silently quadruples BENCH_r05."""
    s = _soup()
    # dense_operator_max=0-sized scenes only: the soup at bench scale has no
    # inv_dense; force the same condition at test scale.
    s._dense_operator_max = 0
    s._prepare()
    colls = _runtime_collision_shapes(s)
    inv_dense = (
        s._topology.inv_dense
        if s._topology.inv_dense.shape[0] == int(s._state.capacity)
        else None
    )
    assert inv_dense is None
    assert s._config.strain_contiguous and s._config.volume_contiguous
    assert s._config.tet_fused
    assert s._topology.tet_block6 is not None
    assert tetcols.applies(s._state, s._topology, colls, s._config, None)


def test_pinned_soup_keeps_tetcols_path():
    """Position pins are diagonal-only in the PD operator
    (Constraints.cpp:65-74) and must NOT evict the fast path — the
    realistic 'soup + a few pinned nodes' configuration (VERDICT r4 #6b)."""
    s = _soup()
    s._dense_operator_max = 0
    # Pin a few nodes with a PD-scale stiffness.
    s._builder.pos_idx.append(np.asarray([0, 5, 9], np.int32))
    s._builder.pos_w.append(np.full(3, 8000.0, np.float32))
    s._dirty = True
    s._prepare()
    colls = _runtime_collision_shapes(s)
    assert s._topology.position.idx.shape[0] > 0
    assert tetcols.applies(s._state, s._topology, colls, s._config, None)


def test_pinned_soup_pins_hold_and_match_generic():
    """The pinned-soup fast path must produce the generic path's physics:
    pinned nodes stay at their targets, free nodes fall identically."""
    def run(tet_cols):
        s = _soup(n_tets=24)
        s._dense_operator_max = 0
        s._builder.pos_idx.append(np.asarray([0, 5], np.int32))
        s._builder.pos_w.append(np.full(2, 8000.0, np.float32))
        s._dirty = True
        s._prepare()
        if not tet_cols:
            import dataclasses

            s._config = dataclasses.replace(s._config, tet_cols=False)
        for _ in range(8):
            s.tick()
        assert not s.sim_failed
        return np.asarray(s._state.positions[: s._builder.num_nodes])

    fast = run(True)
    generic = run(False)
    # Identical math up to float reassociation of the solve order.
    np.testing.assert_allclose(fast, generic, atol=2e-4)
    # And the pins actually held (the advisor's w=1.0 bug would let them
    # fall ~0.5 units in 8 ticks).
    s0 = _soup(n_tets=24)
    s0._prepare()
    start = np.asarray(s0._state.positions)[[0, 5]]
    np.testing.assert_allclose(fast[[0, 5]], start, atol=0.05)


def test_mixed_scene_detects_super_layout():
    """The mixed cloth-over-soup bench depends on the super-body broadphase
    (packed prefix + loose cloth rows); losing the layout detection would
    silently fall back to the slow per-triangle cell-list path."""
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_tet_soup(120, spacing=1.6, scale=0.8, w=2000.0, height=0.5,
                      jitter=0.05)
    side = int(np.ceil((120 * 1.6 ** 3) ** (1 / 3)))
    sheet_n = 8
    sx = np.linspace(-side * 0.4, side * 0.4, sheet_n, dtype=np.float32)
    gx, gz = np.meshgrid(sx, sx, indexing="ij")
    pts = np.stack([gx, np.full_like(gx, 3.2), gz], -1).reshape(-1, 3)
    ids = s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.25)
    g = ids.reshape(sheet_n, sheet_n)
    pairs = np.concatenate([
        np.stack([g[:-1, :].ravel(), g[1:, :].ravel()], 1),
        np.stack([g[:, :-1].ravel(), g[:, 1:].ravel()], 1),
    ])
    s._builder._emit_distance(pairs, 4000.0)
    tris = np.concatenate([
        np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(), g[1:, 1:].ravel()], 1),
        np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(), g[:-1, 1:].ravel()], 1),
    ])
    s._builder._emit_triangles(tris)
    s._dirty = True
    # Super-body detection requires the grid regime (above the all-pairs
    # threshold); the bench scene is far above it, this test forces it.
    s._allpairs_max = 16
    s._prepare()
    assert s._topology.super_corners is not None, (
        "super-body layout not detected for the mixed scene"
    )
    assert s._config.super_k > 0


def test_budget_overrides_compose_with_auto_budget():
    """budget_overrides raises named caps while keeping the auto-sized
    rest (an explicit CollisionBudget would reset per-cell/per-tri caps to
    defaults — the advisor's r4 finding)."""
    mk = lambda **kw: _soup(n_tets=48, **kw)
    base = mk()
    base._prepare()
    over = mk(budget_overrides=dict(max_point_tri_contacts=4096))
    over._prepare()
    assert over._config.budget.max_point_tri_contacts == 4096
    # Everything else inherits the auto-budget values.
    import dataclasses

    for f in dataclasses.fields(base._config.budget):
        if f.name == "max_point_tri_contacts":
            continue
        assert getattr(over._config.budget, f.name) == getattr(
            base._config.budget, f.name
        ), f.name
