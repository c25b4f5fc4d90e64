"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
compile and execute without TPU hardware (SURVEY.md section 4).  The env vars
must be set before jax initializes its backends, hence at import time here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU is attached
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

# The environment may import jax at interpreter startup (sitecustomize
# registering a TPU PJRT plugin), in which case env vars above are read too
# late; jax.config.update always wins.
import jax

jax.config.update("jax_platforms", "cpu")
# Torch golden comparisons need f32 matmuls to agree to ~1e-5.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the suite is dominated by XLA:CPU compiles
# of stable shapes; caching them makes repeat runs several times faster.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/sais_tpu_test_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
