#!/usr/bin/env python
"""Benchmark all five BASELINE.json configs on the current backend.

Prints one JSON line per config and writes BENCH_ALL.json at the repo root.
(The driver-facing headline bench stays bench.py — one line, config 5.)

  python scripts/bench_all.py            # real chip
  PIES_BENCH_SMALL=1 python scripts/bench_all.py   # smoke sizes
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_ticks(solver, warmup, ticks):
    # Batched stepping: per-dispatch tunnel overhead is ~27 ms x leaf count;
    # warmup at the SAME batch size so the timed call reuses the executable.
    del warmup
    solver.run_ticks(ticks)
    t0 = time.perf_counter()
    solver.run_ticks(ticks)
    dt = time.perf_counter() - t0
    assert not solver.sim_failed, "scene latched sim failure"
    return ticks / dt


def result(name, particles, steps_per_sec, iters, extra=None):
    row = {
        "config": name,
        "particles": particles,
        "steps_per_sec": round(steps_per_sec, 4),
        "tick_ms": round(1000.0 / steps_per_sec, 3),
        "particle_iters_per_sec": round(steps_per_sec * particles * iters),
    }
    row.update(extra or {})
    print(json.dumps(row))
    return row


def main():
    small = bool(os.environ.get("PIES_BENCH_SMALL"))
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.parallel import ensemble

    rows = []
    # 40 batched ticks per timed dispatch: the remote-TPU tunnel costs
    # ~20-30 ms per dispatch (PLAN.md *Measurement protocol*), which at 10
    # ticks still poisoned small-scene rows by 2-3 ms/tick.  The metric is
    # the sim's steady-state steps/sec, so amortize the constant.
    warmup, ticks = (1, 3) if small else (3, 40)

    # Config 1: rope fleet, PBD (~2k particles, distance + pin): 128-node
    # pinned ropes.  The chain-scan projection (Topology.chains) reproduces
    # the reference's sequential in-order update exactly, so long chains
    # are as stable here as there (round 3's 32-link cap — the Jacobi
    # form's stability limit, FIDELITY.md #19 — is lifted).  Mirrored
    # exactly by scripts/refbench.
    per = 128
    n_rope = 256 if small else 2048
    s = Solver(SolverOptions(solver=SolverName.PBD), enable_collisions=True)
    for r in range(n_rope // per):
        start = (0.5 * (r % 4), 8.0, 0.7 * (r // 4))
        end = (start[0] + 12.0, 8.0, start[2])
        s.create_rope(start, end, per, w=0.9)
    rows.append(result("rope_pbd", n_rope, time_ticks(s, warmup, ticks), 4))

    # Config 2: hanging cloth sheet, PD + CG (the reference's 20x20
    # createSheet; parity scene — tiny, overhead-bound on TPU).
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_sheet((0.0, 10.0, 0.0), 1.0, 1.0, 5000.0)
    rows.append(result("cloth_pd_20x20", s._builder.num_nodes,
                       time_ticks(s, warmup, ticks), 4))

    # Config 3: tet-mesh cube drop through the mesh-import path
    # (addTriMeshVolume analog: native mesher), floor contact + friction.
    res = 4 if small else 10
    verts = np.array(
        [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0],
         [0, 0, 2], [2, 0, 2], [2, 2, 2], [0, 2, 2]], np.float32
    ) + np.array([0.0, 0.5, 0.0], np.float32)
    tris = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [1, 2, 6], [1, 6, 5], [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]],
        np.int32,
    )
    from pies_tpu.scene.tetmesh import tetrahedralize
    points, tets, surface = tetrahedralize(verts, tris, res)
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    ids = s._builder._emit_nodes(points, inv_mass=1.0, radius=0.2)
    s._builder._emit_tets(ids[tets], 1000.0)
    s._builder._emit_triangles(ids[surface])
    s._dirty = True
    rows.append(result("tet_cube_drop", s._builder.num_nodes,
                       time_ticks(s, warmup, ticks), 4,
                       {"tets": int(tets.shape[0])}))

    # Config 3b: large imported mesh (the reference's flagship path at
    # scale, VERDICT r4 #1): the dumped 110k-node / 623k-tet cube (identical
    # scene integrated by scripts/refbench's "mesh" scene; cube side 12 —
    # at side 2 the reference's world-unit CompRange quirk latches
    # _simFailed, see scripts/dump_mesh.py).  Skipped in small mode and
    # when the dump is absent.
    mesh_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "refbench", "tet_cube_mesh_100k.txt")
    if not small and os.path.exists(mesh_path):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from prof_mesh import load_mesh_txt

        points, mtets, msurf = load_mesh_txt(mesh_path)
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
        ids = s._builder._emit_nodes(points, inv_mass=1.0, radius=0.2)
        s._builder._emit_tets(ids[mtets], 1000.0)
        s._builder._emit_triangles(ids[msurf])
        s._dirty = True
        # Heavy shared-node scenes run CHUNKED dispatches (host.run_ticks
        # bounds per-dispatch execution below the tunnel's worker-kill
        # threshold), and chunk sizes adapt to measured tick time — warm
        # twice so the timed call reuses stabilized chunk executables
        # instead of compiling new ones mid-measurement.
        mt = 8
        s.max_ticks_per_dispatch = 4  # pinned chunk: no mid-measurement compiles
        s.run_ticks(mt)
        s.run_ticks(mt)
        t0 = time.perf_counter()
        s.run_ticks(mt)
        sps = mt / (time.perf_counter() - t0)
        assert not s.sim_failed, "mesh scene latched sim failure"
        rows.append(result("tet_mesh_100k", s._builder.num_nodes, sps, 4,
                           {"tets": int(mtets.shape[0])}))

    # Config 5c: soup + pins — the realistic "imported soup with a few
    # kinematic anchors" configuration (VERDICT r4 #6).  Position pins are
    # diagonal-only in the PD operator, so the tet-column fast path must
    # hold (guarded by tests/test_fastpaths.py); this row would quadruple
    # if the gate regressed.
    n_tets_pin = 32 if small else 12_500
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    pin_ids = s.create_tet_soup(n_tets_pin, spacing=1.6, scale=0.8,
                                w=2000.0, height=0.5, jitter=0.05)
    pins = pin_ids[:: max(1, pin_ids.shape[0] // 100)][:100]
    s._builder.pos_idx.append(pins.astype(np.int32))
    s._builder.pos_w.append(np.full(pins.shape[0], 8000.0, np.float32))
    s._dirty = True
    rows.append(result("tet_soup_pinned", s._builder.num_nodes,
                       time_ticks(s, warmup, ticks), 4,
                       {"tets": n_tets_pin, "pins": int(pins.shape[0])}))

    # Config 4a: multi-body shape-matching blobs (PD, floor contact).
    nb = 4 if small else 64
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    side = int(np.ceil(nb ** 0.5))
    for b in range(nb):
        i, j = divmod(b, side)
        s.create_shape_matching_box(
            (3.0 * i, 1.0 + 0.5 * (b % 3), 3.0 * j), 5, 5, 5, 1.0,
            (0.0, 0.0, 0.0), 4000.0,
        )
    rows.append(result("shape_matching_blobs", s._builder.num_nodes,
                       time_ticks(s, warmup, ticks), 4, {"bodies": nb}))

    # Config 4b: PBD node-node pile (sorted-grid broadphase, per-iteration
    # re-detect — the reference's inline PBD response, Solver.cpp:81-130).
    npts = 512 if small else 8192
    rng = np.random.default_rng(3)
    pts = rng.uniform([-4, 0.5, -4], [4, 6.0, 4], (npts, 3)).astype(np.float32)
    s = Solver(SolverOptions(solver=SolverName.PBD), enable_collisions=True)
    s.add_nodes(pts)
    rows.append(result("pbd_node_pile", npts, time_ticks(s, warmup, ticks), 4))

    # Config 4c: mixed-body contact scene (cloth sheet falling onto a tet
    # soup).  Mixed scenes have no uniform body stride, so detection runs
    # the per-triangle cell-list path; this row measures its per-triangle
    # throughput against the packed-body soup rows (VERDICT round-2 #9:
    # "within 2x of the pure-soup path's per-triangle throughput").
    n_tets_mix = 32 if small else 12_500
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_tet_soup(n_tets_mix, spacing=1.6, scale=0.8, w=2000.0,
                      height=0.5, jitter=0.05)
    side = int(np.ceil((n_tets_mix * 1.6 ** 3) ** (1 / 3)))
    sheet_n = 4 if small else 48
    # An unpinned cloth: distance-constrained lattice dropped onto the soup.
    sx = np.linspace(-side * 0.4, side * 0.4, sheet_n, dtype=np.float32)
    gx, gz = np.meshgrid(sx, sx, indexing="ij")
    pts = np.stack([gx, np.full_like(gx, 3.2), gz], -1).reshape(-1, 3)
    ids = s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.25)
    g = ids.reshape(sheet_n, sheet_n)
    pairs = np.concatenate([
        np.stack([g[:-1, :].ravel(), g[1:, :].ravel()], 1),
        np.stack([g[:, :-1].ravel(), g[:, 1:].ravel()], 1),
        np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel()], 1),
    ])
    s._builder._emit_distance(pairs, 4000.0)
    tris = np.concatenate([
        np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(), g[1:, 1:].ravel()], 1),
        np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(), g[:-1, 1:].ravel()], 1),
    ])
    s._builder._emit_triangles(tris)
    s._dirty = True
    s._prepare()
    n_tris = int(np.concatenate(s._builder.triangles).shape[0])
    sps = time_ticks(s, warmup, ticks)
    rows.append(result(
        "mixed_cloth_over_soup", s._builder.num_nodes, sps, 4,
        {"tris": n_tris,
         "tri_ticks_per_sec": round(sps * n_tris)},
    ))

    # Config 4d: crossing wireframe nets, edge-edge collisions ON.  The
    # reference's edge-edge machinery is dead code (generation commented
    # out, Solver.cpp:799-823); this row proves the rebuilt capability at
    # scale (VERDICT r3 #7): a rotated net dropped onto a pinned net, every
    # strand crossing mediated by edge-edge contacts, stable over 200+
    # ticks with bounded penetration.
    nn = 6 if small else 24

    def emit_net(s, y, angle, pin_corners):
        # Pitch 1.0: the edge-edge narrowphase keeps the reference's
        # hard-coded 0.5-unit proximity pre-check (CollisionDetection.
        # cpp:372), so any net with strand pitch <= 0.5 self-contacts on
        # every in-plane pair and detonates under the w=1e6 weight.
        half = 0.5 * (nn - 1) * 1.0
        sx = np.linspace(-half, half, nn, dtype=np.float32)
        gx, gz = np.meshgrid(sx, sx, indexing="ij")
        c, si = np.cos(angle), np.sin(angle)
        px = c * gx - si * gz
        pz = si * gx + c * gz
        pts = np.stack([px, np.full_like(gx, y), pz], -1).reshape(-1, 3)
        ids = s._builder._emit_nodes(
            pts.astype(np.float32), inv_mass=1.0, radius=0.08
        )
        g = ids.reshape(nn, nn)
        pairs = np.concatenate([
            np.stack([g[:-1, :].ravel(), g[1:, :].ravel()], 1),
            np.stack([g[:, :-1].ravel(), g[:, 1:].ravel()], 1),
        ])
        s._builder._emit_distance(pairs, 4000.0)
        tris = np.concatenate([
            np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(),
                      g[1:, 1:].ravel()], 1),
            np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(),
                      g[:-1, 1:].ravel()], 1),
        ])
        s._builder._emit_triangles(tris)
        if pin_corners:
            corners = np.array(
                [g[0, 0], g[0, -1], g[-1, 0], g[-1, -1]], np.int32
            )
            s._builder.pos_idx.append(corners)
            # PD position weights are stiffnesses competing with inertia
            # m/dt^2 (~6900 at dt=0.012) and the 4000-stiffness net edges;
            # w=1.0 is the PBD blend convention and leaves the net free.
            s._builder.pos_w.append(np.full(4, 8000.0, np.float32))
        return tris.shape[0]

    s = Solver(
        SolverOptions(solver=SolverName.PD),
        enable_collisions=True,
        enable_edge_collisions=True,
        # Intended closest-point math: quirk mode literally reproduces the
        # reference's dead-code sign bug (the edge projection ATTRACTS,
        # CollisionConstraint.cpp:299-312) — unusable on a live scene.
        reference_quirks=False,
        # Full coupling: the recentered lagged correction diverges for
        # 4-node w=1e6 edge contacts (round-5 finding; PLAN.md) — the
        # exact AᵀA operator (the reference's own formulation) is stable.
        contact_coupling="full",
        # Raise only the contact caps; the scene-derived auto budget keeps
        # per-cell/per-tri caps sized for the dense crossing region.
        budget_overrides=dict(
            max_point_tri_contacts=2048, max_edge_contacts=2048
        ),
    )
    nt = emit_net(s, 1.2, 0.0, pin_corners=True)
    nt += emit_net(s, 1.45, np.pi / 4, pin_corners=False)
    s._dirty = True
    # A failed stability criterion must not abort the suite (the JSON with
    # every other row is the round's evidence) — record the failure row.
    try:
        sps = time_ticks(s, warmup, ticks)
        # Stability: 200 more ticks; the top net must drape on the bottom
        # one (no tunnel-through) and the failure latch must stay clear.
        extra = 8 if small else 200
        s.run_ticks(extra)
        assert not s.sim_failed, "edge-net scene latched sim failure"
        pos = np.asarray(s._state.positions[: s._builder.num_nodes])
        top = pos[nn * nn:]
        # Drape criterion: the unpinned top net must stay clear of the
        # floor (the pinned bottom net sags under its load, so an absolute
        # height would be fragile) — clearance of 2x node radius means
        # every strand is still carried by edge-edge contacts.
        assert float(top[:, 1].min()) > 2 * 0.08, (
            "top net tunneled through", float(top[:, 1].min())
        )
        rows.append(result(
            "edge_nets", s._builder.num_nodes, sps, 4,
            {"tris": nt, "edge_collisions": True,
             "stable_ticks": int(ticks * 2 + extra)},
        ))
    except AssertionError as exc:
        rows.append(result(
            "edge_nets", s._builder.num_nodes, 0.001, 4,
            {"tris": nt, "edge_collisions": True, "stable": False,
             "error": str(exc)[:120]},
        ))

    # Config 5a: the 500k stress soup is bench.py's headline line (run that
    # separately).  Config 5b here: 64-scene vmapped ensemble rollout.
    n_scenes = 4 if small else 64
    n_tets = 32 if small else 512
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
    s.create_tet_soup(n_tets, spacing=1.6, scale=0.8, w=2000.0, height=0.5,
                      jitter=0.05)
    s._prepare()
    params = s.current_params()
    states = ensemble.stack_ensemble(s._state, n_scenes)
    import jax
    from functools import partial

    # One dispatch per `ticks` batch (ensemble_tick_n) — per-tick host-loop
    # dispatch cost (~27 ms over the tunnel) was half this row in round 4.
    step_n = jax.jit(partial(
        ensemble.ensemble_tick_n, topo=s._topology, params=params,
        config=s._config, n=ticks,
    ))
    states, _ = step_n(states)
    _ = bool(states.sim_failed[0])  # value fetch = real sync over the tunnel
    t0 = time.perf_counter()
    states, _ = step_n(states)
    _ = bool(states.sim_failed[0])
    sps = ticks / (time.perf_counter() - t0)
    assert not bool(states.sim_failed.any()), "ensemble member latched failure"
    rows.append(result(
        "ensemble_vmap", int(s._state.capacity) * n_scenes, sps, 4,
        {"scenes": n_scenes, "scene_steps_per_sec": round(sps * n_scenes, 2)},
    ))

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_ALL.json")
    with open(out, "w") as f:
        json.dump({"results": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
