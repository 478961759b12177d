"""Dev smoke: PBD chain-scan distance projection vs a sequential NumPy
oracle on a 128-node rope (the scale where batched Jacobi diverges,
FIDELITY.md #19).  CPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pies_tpu.options import SolverName, SolverOptions
from pies_tpu.solver.host import Solver

N = 128
opts = SolverOptions(solver=SolverName.PBD)
s = Solver(opts, enable_collisions=False)
s.create_rope((0, 12.0, 0), (10, 12.0, 0), N, w=1.0)
s._prepare()
cfg = s._config
print("distance_chain:", cfg.distance_chain, "colors:", cfg.distance_colors)
assert cfg.distance_chain, "chain layout not detected"

# Sequential NumPy oracle of the reference PBD tick (Solver.cpp:47-158),
# collisions off: advect, [position pins; sequential distance], floor
# clamp, damped velocity.
pos = np.asarray(s._state.positions[:N], np.float64)
vel = np.zeros_like(pos)
dist_idx = np.stack([np.arange(1, N), np.arange(0, N - 1)], axis=-1)
rest = np.linalg.norm(pos[dist_idx[:, 1]] - pos[dist_idx[:, 0]], axis=-1)
p_idx = np.asarray(s._topology.position.idx)
p_tgt = np.asarray(s._topology.position.target)
p_w = np.asarray(s._topology.position.w)
radius = np.asarray(s._state.radius[:N], np.float64)
dt = opts.fixed_timestep_size
dw = 1.0

T = 150
for t in range(T):
    prev = pos.copy()
    pos = pos + vel * dt
    pos[:, 1] -= opts.gravity * dt * dt
    for _ in range(opts.iterations):
        for j in range(p_idx.shape[0]):
            pos[p_idx[j]] += p_w[j] * (p_tgt[j] - pos[p_idx[j]])
        for j in range(dist_idx.shape[0]):
            a, b = dist_idx[j]
            diff = pos[b] - pos[a]
            d = np.linalg.norm(diff)
            dirv = diff / d if d > 1e-5 else np.array([1.0, 0, 0])
            disp = rest[j] - d
            pos[a] += dw * (-disp * dirv)
        lift = opts.floor_height + radius - pos[:, 1]
        pos[:, 1] += np.maximum(lift, 0.0)
    vel = (1.0 - opts.damping) * (pos - prev) / dt
    on_floor = pos[:, 1] - radius <= opts.floor_height
    sp = np.sqrt(vel[:, 0] ** 2 + vel[:, 2] ** 2)
    scale = np.where(on_floor & (sp < 5.0), 0.0,
                     np.where(on_floor, 1.0 - opts.friction, 1.0))
    vel[:, 0] *= scale
    vel[:, 2] *= scale

for t in range(T):
    s.tick()
got = np.asarray(s.get_vertices()["position"][:N], np.float64)
assert not s.sim_failed, "sim failed"
err = np.abs(got - pos).max()
rel = err / max(1.0, np.abs(pos).max())
print(f"max abs err vs oracle after {T} ticks: {err:.3e} (rel {rel:.3e})")
print("rope tip y:", got[-1, 1], "oracle:", pos[-1, 1])
seg = np.linalg.norm(np.diff(got, axis=0), axis=1)
print("max seg stretch:", float(seg.max() / (10.0 / (N - 1))))
assert np.isfinite(got).all()
assert rel < 5e-2, "trajectory diverged from sequential oracle"
print("OK")
