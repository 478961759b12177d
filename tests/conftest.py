"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(``shard_map`` over a mesh) execute without TPU hardware; the driver
separately dry-runs the multi-chip path, and ``bench.py`` runs on the real
chip.

Note: this environment force-registers a remote TPU backend through a
``sitecustomize`` hook that overrides the ``JAX_PLATFORMS`` env var, so the
platform must be pinned programmatically before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
