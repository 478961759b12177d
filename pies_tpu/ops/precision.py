"""Full-precision contraction helpers.

TPU matmul units default to bfloat16 inputs; for the engine's small (3x3,
3x4) per-constraint contractions that costs ~3 decimal digits on every
deformation gradient and is unacceptable for constraint projection.  Every
einsum in the compute path goes through this wrapper, which pins
``Precision.HIGHEST`` (full f32 on the MXU).  The arrays are tiny, so the
MXU-pass cost difference is irrelevant; HBM traffic dominates.
"""

from functools import partial

import jax
import jax.numpy as jnp

einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
