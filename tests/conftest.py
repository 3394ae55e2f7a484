"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths can be
exercised without TPU hardware (SURVEY.md section 4: CPU device-count based
sharding tests).  Environment must be set before the first jax import.
"""

import os

# Force CPU regardless of the ambient platform (the environment exports
# JAX_PLATFORMS=axon for the tunneled TPU; tests must not claim the chip).
os.environ["JAX_PLATFORMS"] = "cpu"
import re  # noqa: E402
# replace (not keep) any pre-existing count: an ambient flag with a
# different device count would silently break every 8-device mesh test
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", "")).strip()
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()
import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The environment's sitecustomize imports jax at interpreter startup and
# pins the platform to the tunneled TPU — env vars set here are too late,
# so force the platform through the config (backends init lazily, on first
# use, and honor XLA_FLAGS set above).
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Full-precision matmuls for parity tests (the platform default is bf16).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: first compilation on this CPU is slow
# (tens of seconds); cache makes repeated test runs fast.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
