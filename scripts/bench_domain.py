#!/usr/bin/env python
"""Domain-decomposition scaling measurement (VERDICT r3 #6).

Weak-scaling protocol on the virtual CPU mesh (no multi-chip hardware in
this environment; ICI collectives are exercised for real by the driver's
``dryrun_multichip``): each slab owns a constant per-slab load — a tet-soup
block of ``TETS_PER_SLAB`` tets in contact with the floor — and the scene
for ``D`` slabs is ``D`` such blocks side by side along x.  Reported per
row:

* ``domain_tick_ms``   — the sharded tick (halo ppermutes + psum-CG) over a
  ``D``-device mesh;
* ``single_tick_ms``   — the single-device tick on ONE block (equal
  per-slab load), same generic code paths as the domain tick
  (``tet_cols`` / packed broadphase off — the domain tick runs the general
  cell-list pipeline);
* ``ratio``            — domain per-slab cost vs the equal-load single
  device (the VERDICT criterion: ≤ ~1.5x).

CPU wall-clock is only meaningful as a *ratio* at fixed per-slab load: the
absolute numbers say nothing about v5e.  Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_domain.py
"""

import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize hook force-registers the remote axon TPU
# backend and OVERRIDES the JAX_PLATFORMS env var (see tests/conftest.py) —
# the platform must be pinned programmatically or jax.devices() returns the
# single real chip and the multi-device loop never runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

TETS_PER_SLAB = int(os.environ.get("PIES_DOM_TETS", 256))
TICKS = int(os.environ.get("PIES_DOM_TICKS", 10))


def build_scene(n_blocks):
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions

    # The generic paths mirror what the domain tick runs inside each slab
    # (spatial renumbering breaks body contiguity, parallel/domain.py
    # make_domain_tick): disable the packed-body/tet-column specializations
    # so the equal-load comparison is code-path-for-code-path.
    s = Solver(
        SolverOptions(solver=SolverName.PD),
        enable_collisions=True,
        allpairs_broadphase_max=0,
    )
    side = int(np.ceil(TETS_PER_SLAB ** (1 / 3)))
    rng = np.random.default_rng(7)
    pts_all, tets_all, tris_all = [], [], []
    n0 = 0
    spacing, scale = 1.6, 0.8
    for blk in range(n_blocks):
        x0 = blk * side * spacing * 1.25
        k = 0
        for i in range(side):
            for j in range(side):
                for l in range(side):
                    if k >= TETS_PER_SLAB:
                        break
                    base = np.array(
                        [x0 + i * spacing, 0.5 + j * spacing, l * spacing],
                        np.float32,
                    )
                    jit = rng.uniform(-0.05, 0.05, (4, 3)).astype(np.float32)
                    corners = base + jit + np.array(
                        [[0, 0, 0], [scale, 0, 0], [0, scale, 0],
                         [0, 0, scale]], np.float32,
                    )
                    ids = np.arange(n0, n0 + 4, dtype=np.int32)
                    pts_all.append(corners)
                    tets_all.append(ids)
                    tris_all.append(
                        ids[[0, 2, 1, 0, 1, 3, 0, 3, 2, 1, 2, 3]].reshape(4, 3)
                    )
                    n0 += 4
                    k += 1
    pts = np.concatenate(pts_all)
    ids = s._builder._emit_nodes(pts, inv_mass=1.0, radius=0.2)
    s._builder._emit_tets(ids[np.stack(tets_all)], 2000.0)
    s._builder._emit_triangles(ids[np.concatenate(tris_all)])
    s._dirty = True
    s._prepare()
    return s


def time_fn(fn, *args):
    out = fn(*args)  # compile + warm
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(TICKS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / TICKS * 1000.0


def _sync(out):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        out,
    )


def main():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pies_tpu.parallel import ensemble
    from pies_tpu.parallel.domain import make_domain_tick, partition_domain
    from pies_tpu.solver.step import tick_n

    n_dev = len(jax.devices())
    rows = []

    # Equal-load single-device reference: ONE block, generic paths.
    s1 = build_scene(1)
    params = s1.current_params()
    st, topo, cfg = s1._state, s1._topology, s1._config

    def single(st):
        out, _ = tick_n(st, topo, params, cfg, 1)
        return out

    single_ms = time_fn(single, st)
    print(json.dumps({"config": "single_1blk", "tick_ms": round(single_ms, 2),
                      "tets": TETS_PER_SLAB}))

    for d in (2, 4, 8):
        if d > n_dev:
            break
        s = build_scene(d)
        params = s.current_params()
        dom = partition_domain(
            s._state, s._topology, n_slabs=d, collision_margin=2.5
        )
        mesh = ensemble.make_mesh(d, axis="x")
        sh = NamedSharding(mesh, P("x"))
        put = lambda a: jax.device_put(np.asarray(a), sh)
        dstate = jax.tree_util.tree_map(put, dom.state)
        dstatic = jax.tree_util.tree_map(put, dom.static)
        dtick = make_domain_tick(mesh, s._config, dom.meta)

        def run(dstate):
            out, _ = dtick(dstate, dstatic, params)
            return out

        ms = time_fn(run, dstate)
        rows.append({
            "config": f"domain_{d}slab",
            "tick_ms": round(ms, 2),
            "tets": TETS_PER_SLAB * d,
            # The D virtual devices SHARE one physical core, so D slabs of
            # equal load cost >= D x single-slab wall time even at zero
            # overhead; the per-slab cost ratio (the VERDICT criterion,
            # <= ~1.5x) is wall / (D * single).  On real multi-chip
            # hardware the D factor disappears and wall/single is the
            # criterion directly.
            "per_slab_vs_single": round(ms / (d * single_ms), 3),
        })
        print(json.dumps(rows[-1]))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DOMAIN.json",
    )
    with open(out, "w") as f:
        json.dump({"tets_per_slab": TETS_PER_SLAB,
                   "single_tick_ms": round(single_ms, 2),
                   "results": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
