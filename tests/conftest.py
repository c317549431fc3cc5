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


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_slow(request):
    """Release compiled executables after each slow-tier test.

    The slow tier compiles ~16 large distinct graphs (full renders +
    gradient transposes) in one process; on a small-RAM host the XLA CPU
    compiler's cumulative footprint eventually segfaults mid-compile
    (observed twice at the 13th slow test, which passes alone).  Slow
    tests don't share jit graphs, so dropping the cache between them
    costs nothing and bounds peak memory."""
    yield
    if request.node.get_closest_marker("slow") is not None:
        jax.clear_caches()
