#!/usr/bin/env python
"""Microbenchmarks of the TPU primitives the collision pipeline leans on.

Each case runs inside one jitted fori_loop with a data dependence between
iterations (so XLA cannot CSE or elide the op) and reports rows/second.
Used to pick broadphase/narrowphase structures; results recorded in PLAN.md.

Run on the real chip:  python scripts/microbench_primitives.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 16


def timeit(name, fn, *args, rows):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:48s} {rows/dt/1e6:10.1f} M rows/s   ({1e3*dt:8.3f} ms/rep)")


def dep_loop(body):
    def run(*args):
        def step(i, carry):
            return body(i, carry, *args[1:])
        return jax.lax.fori_loop(0, REPS, step, args[0])
    return run


def main():
    n = 1 << 19  # 524288 nodes
    k = 1 << 20  # 1M flat indices
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, 3), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (k,), 0, n, jnp.int32)
    v = jax.random.normal(jax.random.PRNGKey(2), (k, 3), jnp.float32)
    table = jax.random.randint(jax.random.PRNGKey(3), (1 << 21,), 0, 1 << 20, jnp.int32)
    sidx = jnp.sort(idx)

    # 1. random row gather from [N,3]
    timeit(
        "gather rows x[idx]  [N,3]",
        dep_loop(lambda i, c, idx: c + jnp.sum(x[(idx + i) % n])),
        jnp.float32(0), idx, rows=REPS * k,
    )
    # 1b. sorted-index gather
    timeit(
        "gather rows x[sorted idx]",
        dep_loop(lambda i, c, sidx: c + jnp.sum(x[jnp.minimum(sidx + i, n - 1)])),
        jnp.float32(0), sidx, rows=REPS * k,
    )
    # 1c. scalar gather from int table (broadphase bucket lookup shape)
    timeit(
        "gather scalars table[idx]  [H]",
        dep_loop(lambda i, c, idx: c + jnp.sum(table[(idx + i) % (1 << 21)])),
        jnp.int32(0), idx, rows=REPS * k,
    )
    # 1d. wide-row gather (packed body rows, 24 floats)
    xw = jnp.tile(x, (1, 8))  # [N, 24]
    timeit(
        "gather wide rows xw[idx]  [N,24]",
        dep_loop(lambda i, c, idx: c + jnp.sum(xw[(idx[: k // 4] + i) % n])),
        jnp.float32(0), idx, rows=REPS * (k // 4),
    )
    # 1e. tile gather: 128-row tiles (gather-as-matmul source windows)
    xt = x.reshape(n // 128, 128 * 3)
    tidx = idx[: k // 128] % (n // 128)
    timeit(
        "gather 128-row tiles",
        dep_loop(lambda i, c, tidx: c + jnp.sum(xt[(tidx + i) % (n // 128)])),
        jnp.float32(0), tidx, rows=REPS * (k // 128) * 128,
    )

    # 2. scatter-add rows
    timeit(
        "scatter-add rows y.at[idx].add(v)",
        dep_loop(lambda i, c, idx, v: c.at[(idx + i) % n].add(v)),
        jnp.zeros((n, 3)), idx, v, rows=REPS * k,
    )
    # 2b. segment_sum over sorted ids
    timeit(
        "segment_sum sorted",
        dep_loop(
            lambda i, c, sidx, v: c + jax.ops.segment_sum(
                v, jnp.minimum(sidx + i, n - 1), num_segments=n
            )
        ),
        jnp.zeros((n, 3)), sidx, v, rows=REPS * k,
    )

    # 3. gather-as-matmul: sorted dest tiles read SW aligned source tiles and
    #    one-hot matmul picks rows.  Plan built once (per substep analog).
    TILE, SW = 128, 4
    t = k // TILE
    sid_t = sidx.reshape(t, TILE)
    base = jnp.minimum(sid_t[:, 0] // TILE, n // TILE - SW)
    local = sid_t - base[:, None] * TILE
    ok = (local >= 0) & (local < SW * TILE)
    g = (
        (local[:, :, None] == jnp.arange(SW * TILE)[None, None, :]) & ok[:, :, None]
    ).astype(jnp.bfloat16)

    def onehot_gather(i, c, base, g):
        xt4 = x.reshape(n // TILE, TILE, 3)
        win = xt4[base[:, None] + jnp.arange(SW)[None, :]]  # [t,SW,TILE,3]
        win = win.reshape(t, SW * TILE, 3)
        y = jax.lax.dot_general(
            g, win.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return c + jnp.sum(y) + 0 * i

    frac = float(jnp.mean(ok))
    timeit(
        f"onehot-matmul gather (SW={SW}, cover={frac:.3f})",
        dep_loop(onehot_gather),
        jnp.float32(0), base, g, rows=REPS * k,
    )

    # 3b. onehot-matmul scatter-add: transpose the same plan.
    def onehot_scatter(i, c, base, g, v):
        vs = v.reshape(t, TILE, 3).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            g, vs,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [t, SW*TILE, 3]
        contrib = contrib.reshape(t, SW, TILE, 3)
        upd = jnp.zeros((n // TILE, TILE, 3)).at[
            base[:, None] + jnp.arange(SW)[None, :]
        ].add(contrib)
        return c + upd.reshape(n, 3) + 0 * i

    timeit(
        f"onehot-matmul scatter (SW={SW}, tile adds)",
        dep_loop(onehot_scatter),
        jnp.zeros((n, 3)), base, g, v, rows=REPS * k,
    )

    # 4. compare-reduce lanes baseline (packing workhorse)
    a = jax.random.normal(jax.random.PRNGKey(5), (4096, 64, 64), jnp.float32)
    timeit(
        "compare-reduce [4096,64,64]",
        dep_loop(lambda i, c, a: c + jnp.sum((a > i).astype(jnp.float32))),
        jnp.float32(0), a, rows=REPS * a.size,
    )


if __name__ == "__main__":
    main()
