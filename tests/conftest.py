import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# compile + execute without TPU hardware (SURVEY §4 implication).
# The session env pins JAX_PLATFORMS to the real TPU tunnel, and the axon
# sitecustomize imports jax at interpreter start — so the env var is already
# baked into jax's config by the time conftest runs. Override via
# jax.config (the backend itself is not initialized until first use).
# Set DGL_TPU_TEST_ON_TPU=1 to run the suite on hardware instead.
if not os.environ.get("DGL_TPU_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Cache compiled executables across test runs (big win: the suite is
# compile-bound on CPU).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/dgl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
