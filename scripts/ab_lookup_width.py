#!/usr/bin/env python
"""A/B the _lookup_i32 row width (one-hot lane select over W-wide rows)
against direct gather, at broadphase-representative sizes.

  python scripts/ab_lookup_width.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 32


def timeit(name, fn, *args, rows):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = fn(*args)
    _ = int(out.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {rows / dt / 1e6:10.1f} M lookups/s ({1e3 * dt:7.3f} ms/rep)")


def dep_loop(body):
    def run(*args):
        def step(i, c):
            return body(i, c, *args)
        return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))
    return jax.jit(run)


def lookup_w(table, idx, w, sh):
    rows = table.reshape(-1, w)[idx >> sh]
    lane = idx & (w - 1)
    oh = (lane[:, None] == jnp.arange(w, dtype=jnp.int32)).astype(table.dtype)
    return jnp.sum(rows * oh, axis=-1)


def main():
    h = 1 << 19  # 512k-slot table (the soup's body grid)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 24, h, dtype=np.int32))
    for m in (1 << 20, 1 << 22):
        idx = jnp.asarray(rng.integers(0, h, m, dtype=np.int32))
        print(f"--- table {h} slots, {m} queries ---")
        timeit(
            "direct gather table[idx]",
            dep_loop(lambda i, c, t, ix: c + jnp.sum(t[(ix + i) % h])),
            table, idx, rows=REPS * m,
        )
        for w, sh in ((128, 7), (64, 6), (32, 5), (16, 4), (8, 3)):
            timeit(
                f"one-hot rows w={w}",
                dep_loop(
                    lambda i, c, t, ix, _w=w, _s=sh: c
                    + jnp.sum(lookup_w(t, (ix + i) % h, _w, _s))
                ),
                table, idx, rows=REPS * m,
            )


if __name__ == "__main__":
    main()
