#!/usr/bin/env python
"""Profile the mesh-import scene (tet_cube_drop) variants on the real chip.

  python scripts/prof_mesh.py <variant> [res]

Variants: tick | nocoll | dense2k | cg4 | iters1 | stab0
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_mesh_txt(path):
    """Read a scripts/dump_mesh.py dump (the refbench 'mesh' scene format),
    so both engines integrate the byte-identical scene."""
    with open(path) as f:
        nn, nt, ns = (int(v) for v in f.readline().split())
        flat = np.fromstring(f.read(), sep=" ")
    points = flat[: 3 * nn].reshape(nn, 3).astype(np.float32)
    tets = flat[3 * nn : 3 * nn + 4 * nt].reshape(nt, 4).astype(np.int32)
    surface = flat[3 * nn + 4 * nt :].reshape(ns, 3).astype(np.int32)
    return points, tets, surface


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "tick"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions
    from pies_tpu.scene.tetmesh import tetrahedralize

    verts = np.array(
        [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0],
         [0, 0, 2], [2, 0, 2], [2, 2, 2], [0, 2, 2]], np.float32
    ) + np.array([0.0, 0.5, 0.0], np.float32)
    tris = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [1, 2, 6], [1, 6, 5], [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]],
        np.int32,
    )
    if variant.startswith("mesh100k"):
        points, tets, surface = load_mesh_txt(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "refbench", "tet_cube_mesh_100k.txt",
        ))
        res = 47
    else:
        points, tets, surface = tetrahedralize(verts, tris, res)
    kw = {
        "tick": dict(),
        "nocoll": dict(enable_collisions=False),
        "mesh100k": dict(),
        "mesh100k_nocoll": dict(enable_collisions=False),
        "dense2k": dict(dense_operator_max=2048),
        "cg4": dict(cg_iterations=4),
        "iters1": dict(),
        "stab0": dict(),
    }[variant]
    opts = dict(solver=SolverName.PD)
    if variant == "iters1":
        opts["iterations"] = 1
    if variant == "stab0":
        opts["collision_stabilization_iterations"] = 0
    s = Solver(SolverOptions(**opts), enable_collisions=kw.pop(
        "enable_collisions", True), **kw)
    ids = s._builder._emit_nodes(points, inv_mass=1.0, radius=0.2)
    s._builder._emit_tets(ids[tets], 1000.0)
    s._builder._emit_triangles(ids[surface])
    s._dirty = True
    s._prepare()
    print(f"nodes={s._builder.num_nodes} cap={int(s._state.capacity)} "
          f"tets={tets.shape[0]} tris={surface.shape[0]}", flush=True)

    ticks = 40
    s.run_ticks(ticks)
    assert not s.sim_failed, "scene latched sim failure during warmup"
    t0 = time.perf_counter()
    s.run_ticks(ticks)
    dt = (time.perf_counter() - t0) / ticks
    assert not s.sim_failed, "scene latched sim failure during timing"
    line = f"mesh res={res} {variant:8s} {1e3*dt:10.2f} ms/tick"
    print(line)
    with open("/tmp/prof_mesh.txt", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
