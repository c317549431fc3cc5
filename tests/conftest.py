"""Test config: run JAX on CPU with 8 virtual devices so sharding tests can
exercise multi-chip code paths without TPU hardware (SURVEY.md §4.4).

NOTE: jax is pre-imported by a site hook in this image with
JAX_PLATFORMS=axon, so env vars alone are too late — we must override via
jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
