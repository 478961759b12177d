"""Dump the tet_cube_drop mesh (bench_all config 3) to a text file for
scripts/refbench's "mesh" scene, so the C++ reference baseline integrates
the IDENTICAL scene (same points/tets/surface from the native mesher).

Format: "nn nt ns" header, nn "x y z" lines, nt "a b c d" lines,
ns "a b c" lines.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pies_tpu.scene.tetmesh import tetrahedralize


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "scripts/refbench/tet_cube_mesh.txt"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    verts = np.array(
        [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0],
         [0, 0, 2], [2, 0, 2], [2, 2, 2], [0, 2, 2]], np.float32
    ) + np.array([0.0, 0.5, 0.0], np.float32)
    tris = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [1, 2, 6], [1, 6, 5], [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]],
        np.int32,
    )
    # Optional world-scale factor (argv[3]).  The 100k-node row uses scale 6
    # (cube side 12): at scale 1 the reference's world-unit CompRange quirk
    # (Solver.cpp:659-661 — swept AABBs never divided by grid.scale) packs
    # all 26.5k surface tris into ~27 effective cells, >1000 entries/bucket,
    # and the reference latches _simFailed before the first timed tick.
    # Scaling the GEOMETRY (not the options) keeps both engines on the same
    # scene and gives the reference a representable bucket occupancy.
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    points, tets, surface = tetrahedralize(verts, tris, res)
    if scale != 1.0:
        points = points * np.float32(scale)
    with open(out, "w") as f:
        f.write(f"{points.shape[0]} {tets.shape[0]} {surface.shape[0]}\n")
        for p in points:
            f.write(f"{p[0]:.8g} {p[1]:.8g} {p[2]:.8g}\n")
        for t in tets:
            f.write(f"{t[0]} {t[1]} {t[2]} {t[3]}\n")
        for t in surface:
            f.write(f"{t[0]} {t[1]} {t[2]}\n")
    print(f"wrote {out}: {points.shape[0]} nodes, {tets.shape[0]} tets, "
          f"{surface.shape[0]} surface tris")


if __name__ == "__main__":
    main()
