"""Dev smoke: super-body broadphase vs celllist — contact-SET parity on a
small mixed (tet soup + loose cloth) scene, evaluated at states evolved by
the super path.  Trajectories are NOT compared: the super path (like the
round-3 packed path) dedupes (corner, face) contacts that the per-triangle
sweep re-emits once per own-face (documented divergence).  CPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from pies_tpu.collision.broadphase import detect_point_tri_collisions
from pies_tpu.options import SolverName, SolverOptions
from pies_tpu.solver.host import Solver
from pies_tpu.solver.step import tick as tick_fn


def build(n_tets=400, sheet_n=16):
    s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=True)
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
        np.stack([g[:-1, :-1].ravel(), g[1:, :-1].ravel(), g[1:, 1:].ravel()], 1),
        np.stack([g[:-1, :-1].ravel(), g[1:, 1:].ravel(), g[:-1, 1:].ravel()], 1),
    ])
    s._builder._emit_triangles(tris)
    s._dirty = True
    s._prepare()
    return s


s = build()
cfg = s._config
print("super_k", cfg.super_k, "packed_k", cfg.super_packed_k,
      "m", cfg.super_packed_m, "live", cfg.super_live_k,
      "faces", cfg.super_faces, "loose_face", cfg.super_loose_face)
assert cfg.super_k > 0, "super layout not detected"
topo = s._topology
params = s.current_params()

cfg_ref = dataclasses.replace(
    cfg, super_k=0, super_packed_k=0, super_packed_m=0, super_packed_off=0,
    super_live_k=0, super_faces=(), super_packed_e=0, super_loose_face=-1,
    # Compare against the EXACT all-pairs path (celllist can miss borderline
    # contacts through cell-window quantization; all-pairs cannot).  The
    # per-triangle sweep re-emits each (corner, tri) contact once per own
    # face, so its raw hit count carries ~2.5x multiplicity — raise its
    # contact cap so IT never drops a deduped contact the super path keeps.
    budget=dataclasses.replace(
        cfg.budget, max_point_tri_contacts=4 * cfg.budget.max_point_tri_contacts
    ),
    allpairs_broadphase_max=1 << 20,
)


def contact_set(idx, mask):
    idx = np.asarray(idx)
    mask = np.asarray(mask) > 0
    rows = idx[mask]
    return {tuple(int(v) for v in r) for r in rows}


state = s._state
h = float(params.dt)
worst = (0, 0)

@jax.jit
def detect_sup(x, prev):
    return detect_point_tri_collisions(
        x, prev, topo.triangles, topo.tri_mask, params, cfg,
        corners=topo.super_corners, adj=topo.super_adj,
    )


@jax.jit
def detect_ref(x, prev):
    return detect_point_tri_collisions(
        x, prev, topo.triangles, topo.tri_mask, params, cfg_ref,
    )


for i in range(80):
    state, _ = tick_fn(state, topo, params, cfg)
    # advected positions the NEXT substep's detection would see
    x = np.asarray(state.positions + h * state.velocities
                   * state.node_mask[:, None]).astype(np.float32)
    x = jax.numpy.asarray(x)
    sup = detect_sup(x, state.prev_positions)
    ref = detect_ref(x, state.prev_positions)
    cs_sup = contact_set(sup[0], sup[1])
    cs_ref = contact_set(ref[0], ref[1])
    if cs_sup != cs_ref:
        extra = cs_sup - cs_ref
        missing = cs_ref - cs_sup
        print(f"tick {i:3d}: |sup|={len(cs_sup)} |ref|={len(cs_ref)} "
              f"extra={len(extra)} missing={len(missing)}")
        if len(extra) + len(missing) > worst[0]:
            worst = (len(extra) + len(missing), i)
        if i > 5 and (extra or missing):
            print("  extra:", list(extra)[:5])
            print("  missing:", list(missing)[:5])
            sys.exit(1)
    elif i % 10 == 0:
        print(f"tick {i:3d}: contact sets equal ({len(cs_sup)})")
assert not bool(state.sim_failed)
print("OK — contact sets identical across 80 ticks")
