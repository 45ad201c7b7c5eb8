"""Test harness: force CPU with 8 virtual devices so sharding tests run anywhere.

The environment's sitecustomize registers an `axon` TPU backend and force-sets
jax_platforms at interpreter start, so the env-var route is not enough — we
re-update the config before any backend is initialized. (BASELINE.json config
#5 / SURVEY.md §4: multi-host tests runnable on CPU via
--xla_force_host_platform_device_count.)
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache (r4 VERDICT #5): the e2e tiers are dominated by
# jit recompiles of near-identical pipeline programs; caching them across runs
# cuts repeat full-suite time several-fold. Safe under parallel runs (the
# cache is content-addressed, writes are atomic renames).
os.makedirs("/tmp/jax_vo_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_vo_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(7)
