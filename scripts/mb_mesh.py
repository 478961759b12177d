#!/usr/bin/env python
"""Microbenchmark the candidate primitives for the shared-node mesh path.

A connected tet mesh (the reference's addTriMeshVolume flagship,
PrimitiveUtilities.cpp:164-328) breaks every disjoint-tet fast path: the
local step needs real gathers/scatters (corners shared between tets) and
the global operator is no longer 4x4 block-diagonal.  This measures, at
100k-node/500k-tet scale on the real chip:

  gather      x[idx] rows, idx sorted-ish (RCM-ordered mesh)
  gather_flat per-axis flat-column gathers (the tetcols discipline)
  scatter     .at[idx].add of per-tet forces (random + sorted)
  cumscatter  sorted-scatter as cumsum + segment-boundary gather + diff
  band        banded matvec, 2B+1 shifted FMAs on [N, 3]
  blocktri    block-tridiagonal matvec, 3 batched [K,b,b]@[K,b,3]
  blockchol   per-substep batched Cholesky / inverse of [K,b,b]

Appends results to /tmp/mb_mesh.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    line = f"{name:14s} {dt:9.3f} ms"
    print(line, flush=True)
    with open("/tmp/mb_mesh.txt", "a") as f:
        f.write(line + "\n")
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    N = 100_352  # ~100k nodes, multiple of 1024
    C = 500_000  # tets
    B = 128      # assumed post-RCM half bandwidth
    b = 128      # block size
    K = N // b

    rng = np.random.default_rng(0)
    # Sorted-ish corner indices mimicking an RCM-ordered mesh: each tet's
    # corners within a +-B window of a monotonically increasing base.
    base = np.sort(rng.integers(0, N - B - 4, C))
    idx = (base[:, None] + rng.integers(0, B, (C, 4))).astype(np.int32)
    idx = np.minimum(idx, N - 1)
    idx_rand = rng.integers(0, N, (C, 4)).astype(np.int32)

    x = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    xf = [x[:, d] for d in range(3)]
    vals = jnp.asarray(rng.standard_normal((C, 4, 3)), jnp.float32)
    idx_d = jnp.asarray(idx)
    idx_rand_d = jnp.asarray(idx_rand)

    if which in ("all", "gather"):
        bench("gather_sorted", jax.jit(lambda x, i: x[i]), x, idx_d)
        bench("gather_rand", jax.jit(lambda x, i: x[i]), x, idx_rand_d)
        flat = jnp.asarray(idx.T.reshape(-1))  # corner-major [4C]

        @jax.jit
        def gflat(x0, x1, x2, ii):
            return x0[ii], x1[ii], x2[ii]

        bench("gather_flat", gflat, xf[0], xf[1], xf[2], flat)

    if which in ("all", "scatter"):
        bench(
            "scatter_rand",
            jax.jit(lambda v, i: jnp.zeros((N, 3), jnp.float32).at[i].add(v)),
            vals, idx_rand_d,
        )
        bench(
            "scatter_sorted",
            jax.jit(
                lambda v, i: jnp.zeros((N, 3), jnp.float32).at[i].add(
                    v, indices_are_sorted=False, unique_indices=False
                )
            ),
            vals, idx_d,
        )
        # Flat corner-major scatter on sorted slot ids
        flat_sorted = np.sort(idx.reshape(-1)).astype(np.int32)
        fs = jnp.asarray(flat_sorted)
        vflat = vals.reshape(-1, 3)
        bench(
            "scatter_flatsrt",
            jax.jit(
                lambda v, i: jnp.zeros((N, 3), jnp.float32).at[i].add(
                    v, indices_are_sorted=True
                )
            ),
            vflat, fs,
        )

    if which in ("all", "cumscatter"):
        # Sorted-scatter via cumsum: values sorted by destination node;
        # out[n] = csum[end(n)] - csum[start(n)] with boundaries static.
        order = np.argsort(idx.reshape(-1), kind="stable")
        starts = np.searchsorted(idx.reshape(-1)[order], np.arange(N))
        ends = np.searchsorted(idx.reshape(-1)[order], np.arange(N), "right")
        order_d = jnp.asarray(order.astype(np.int32))
        starts_d = jnp.asarray(starts.astype(np.int32))
        ends_d = jnp.asarray(ends.astype(np.int32))

        @jax.jit
        def cumscatter(v):
            vs = v.reshape(-1, 3)[order_d]  # gather into sorted order
            cs = jnp.cumsum(vs, axis=0)
            cs = jnp.concatenate([jnp.zeros((1, 3), v.dtype), cs], 0)
            return cs[ends_d] - cs[starts_d]

        bench("cumscatter", cumscatter, vals)

        # Same but values already produced in sorted order (no permutation
        # gather) - the achievable floor if the local step emits pre-sorted.
        @jax.jit
        def cumscatter_ns(v):
            cs = jnp.cumsum(v.reshape(-1, 3), axis=0)
            cs = jnp.concatenate([jnp.zeros((1, 3), v.dtype), cs], 0)
            return cs[ends_d] - cs[starts_d]

        bench("cumscatter_ns", cumscatter_ns, vals)

    if which in ("all", "band"):
        band = jnp.asarray(
            rng.standard_normal((2 * B + 1, N)), jnp.float32
        )

        @jax.jit
        def bandmv(band, x):
            acc = band[B][:, None] * x
            for d in range(1, B + 1):
                acc = acc + band[B + d][:, None] * jnp.roll(x, -d, axis=0)
                acc = acc + band[B - d][:, None] * jnp.roll(x, d, axis=0)
            return acc

        bench("band_mv", bandmv, band, x, reps=3)

    if which in ("all", "blocktri"):
        D = jnp.asarray(rng.standard_normal((K, b, b)), jnp.float32)
        L = jnp.asarray(rng.standard_normal((K, b, b)), jnp.float32)
        xb = x.reshape(K, b, 3)

        @jax.jit
        def btmv(D, L, xb):
            y = jnp.einsum("kij,kjd->kid", D, xb)
            # sub-diagonal blocks: L[k] @ x[k-1]; super = L[k].T @ x[k+1]
            xm = jnp.concatenate([jnp.zeros((1, b, 3), xb.dtype), xb[:-1]], 0)
            xp = jnp.concatenate([xb[1:], jnp.zeros((1, b, 3), xb.dtype)], 0)
            y = y + jnp.einsum("kij,kjd->kid", L, xm)
            y = y + jnp.einsum("kji,kjd->kid", L, xp)
            return y.reshape(N, 3)

        bench("blocktri_mv", btmv, D, L, xb)

    if which in ("all", "blockchol"):
        A = np.einsum("kij,kpj->kip", *(2 * [rng.standard_normal((K, b, b))]))
        A += np.eye(b) * b
        A_d = jnp.asarray(A, jnp.float32)
        bench("block_chol", jax.jit(jnp.linalg.cholesky), A_d, reps=3)
        bench("block_inv", jax.jit(jnp.linalg.inv), A_d, reps=3)

        inv = jnp.asarray(np.linalg.inv(A), jnp.float32)
        xb = x.reshape(K, b, 3)
        bench(
            "block_apply",
            jax.jit(lambda M, v: jnp.einsum("kij,kjd->kid", M, v)),
            inv, xb,
        )


if __name__ == "__main__":
    main()
