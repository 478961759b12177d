#!/usr/bin/env python
"""Microbench: tet AᵀA apply forms at shared-node-mesh scale (623k tets,
131k nodes).  The generic einsum path materializes [C,4,3]/[C,3,3]
buffers that tile-pad to ~2.5 GB EACH at this scale — several are live per
CG trip and the TPU worker dies (the tet_mesh_100k crash).  Candidate
flat-column replacements, timed on the real chip:

  python -u scripts/mb_tetapply.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    n = 131_072
    c = 623_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.integers(0, n, c) for _ in range(4)], 1), jnp.int32
    )
    g12 = jnp.asarray(rng.standard_normal((12, c)), jnp.float32)  # g[j,a] flat
    w = jnp.asarray(rng.standard_normal(c), jnp.float32)

    idx_t = idx.T.reshape(-1)  # [4C]

    @jax.jit
    def flat_apply_coord_scatter(x):
        xcols = [x[:, d] for d in range(3)]
        gall = [xc[idx_t] for xc in xcols]  # 3 x [4C]
        p = [[gall[d][a * c:(a + 1) * c] for d in range(3)] for a in range(4)]
        e = [
            [
                sum(g12[4 * j + a] * p[a][d] for a in range(4))
                for d in range(3)
            ]
            for j in range(3)
        ]
        r = [
            [
                w * sum(g12[4 * j + a] * e[j][d] for j in range(3))
                for d in range(3)
            ]
            for a in range(4)
        ]
        rows = jnp.concatenate([idx[:, a] for a in range(4) for _ in range(3)])
        cols = jnp.concatenate(
            [jnp.full(c, d, jnp.int32) for _ in range(4) for d in range(3)]
        )
        vals = jnp.concatenate([r[a][d] for a in range(4) for d in range(3)])
        return x.at[rows, cols].add(vals)

    @jax.jit
    def flat_apply_flatbuf(x):
        xcols = [x[:, d] for d in range(3)]
        gall = [xc[idx_t] for xc in xcols]
        p = [[gall[d][a * c:(a + 1) * c] for d in range(3)] for a in range(4)]
        e = [
            [
                sum(g12[4 * j + a] * p[a][d] for a in range(4))
                for d in range(3)
            ]
            for j in range(3)
        ]
        acc = jnp.zeros((3 * n,), jnp.float32)
        slots = jnp.concatenate(
            [d * n + idx[:, a] for a in range(4) for d in range(3)]
        )
        vals = jnp.concatenate(
            [
                w * sum(g12[4 * j + a] * e[j][d] for j in range(3))
                for a in range(4)
                for d in range(3)
            ]
        )
        acc = acc.at[slots].add(vals)
        return x + acc.reshape(3, n).T

    @jax.jit
    def blocks43_scatter(x):
        xcols = [x[:, d] for d in range(3)]
        gall = [xc[idx_t] for xc in xcols]
        p = [[gall[d][a * c:(a + 1) * c] for d in range(3)] for a in range(4)]
        e = [
            [
                sum(g12[4 * j + a] * p[a][d] for a in range(4))
                for d in range(3)
            ]
            for j in range(3)
        ]
        blocks = jnp.stack(
            [
                jnp.concatenate(
                    [
                        w * sum(g12[4 * j + a] * e[j][d] for j in range(3))
                        for a in range(4)
                    ]
                )
                for d in range(3)
            ],
            axis=-1,
        )  # [4C, 3]
        return x.at[idx_t].add(blocks)

    print("flat + (row,col) coord scatter:",
          f"{timeit(flat_apply_coord_scatter, x):8.3f} ms")
    print("flat + [3N] scatter + transpose:",
          f"{timeit(flat_apply_flatbuf, x):8.3f} ms")
    print("flat + [4C,3] block scatter:   ",
          f"{timeit(blocks43_scatter, x):8.3f} ms")


if __name__ == "__main__":
    main()
