#!/usr/bin/env python
"""A/B: Pallas bucket-table lookup vs the XLA two-level lookup.

VERDICT round-2 #3 asked for either a default-path Pallas kernel or a
measured table proving the XLA form wins.  RESULT (2026-08-17, jax 0.8.x,
Mosaic via the axon v5e toolchain): **Pallas cannot express the detection
lookups at all on this toolchain; the XLA two-level lookup stands.**

* Every vectorized-gather formulation — jnp.take of a VMEM-resident table
  (1-D and 2-D operands, 1-D/2-D indices), advanced indexing, per-lane
  take_along_axis on axis 0 and on axis 1 — fails to lower ("Only 2D
  gather is supported" / AssertionError in mosaic lowering).
* The scalar fallback is rejected too: a scalar VMEM read at a dynamic
  lane position fails with "cannot statically prove that index in
  dimension 1 is a multiple of 128", and a [H, 1] layout that would make
  every read lane-0 tile-pads the lane dim 128x (256 MB > VMEM).
* Measured baseline this A/B pins: the production XLA two-level lookup
  (grid._lookup_i32: 128-wide row gather + integer one-hot lane select)
  runs 131k lookups into a 2^19 table in 2.05 ms (~64M lookups/s),
  dependence-carried per the PLAN.md timing protocol.

Re-run when the toolchain gains a Mosaic gather:

  python scripts/ab_pallas_lookup.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pies_tpu.collision.grid import _lookup_i32

REPS = 16


def bench(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    import numpy as np
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:40s} {1e3*dt:9.3f} ms/rep", flush=True)
    return dt


def dep_loop(body):
    def run(x, *args):
        return jax.lax.fori_loop(0, REPS, lambda i, c: body(c, *args), x)

    return run


def scalar_lookup_kernel(table_ref, idx_ref, out_ref):
    # One scalar VMEM read per query — the only gather Mosaic lowers here.
    # Both operands live as [rows, 128] tiles (a [N, 1] i32 in VMEM pads its
    # lane dim to 128 = 256 MB for the table).  Scalar stores to VMEM are
    # rejected too, so the kernel reduces to a checksum in SMEM; a
    # production kernel would need per-query outputs and be strictly
    # slower than this lower bound.
    n = idx_ref.shape[0] * 128

    def body(i, acc):
        q = idx_ref[i >> 7, i & 127]
        return acc + table_ref[q >> 7, q & 127]

    out_ref[0, 0] = jax.lax.fori_loop(0, n, body, jnp.int32(0))


def main():
    h = 1 << 19
    n = 1 << 17  # 131k lookups ~ one detection stage's query count
    table = (
        ((jnp.arange(h, dtype=jnp.uint32) * jnp.uint32(2654435761)) >> 8)
        & jnp.uint32(0xFFFF)
    ).astype(jnp.int32)
    idx = ((jnp.arange(n, dtype=jnp.int32) * 7919) % h).astype(jnp.int32)

    def xla_two_level(carry, table, idx):
        v = _lookup_i32(table, (idx + (carry & 1)) % h)
        return carry + v.sum()

    bench("XLA two-level lookup (production)",
          dep_loop(xla_two_level), jnp.int32(0), table, idx)

    pallas_fn = pl.pallas_call(
        scalar_lookup_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )

    def pallas_scalar(carry, table, idx):
        v = pallas_fn(
            table.reshape(-1, 128),
            (((idx + (carry & 1)) % h)).reshape(-1, 128),
        )
        return carry + v[0, 0]

    bench("Pallas scalar-loop lookup",
          dep_loop(pallas_scalar), jnp.int32(0), table, idx)


if __name__ == "__main__":
    main()
