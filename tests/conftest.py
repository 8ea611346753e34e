"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware.

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
env var, so we must use jax.config.update('jax_platforms', ...) after
import — XLA_FLAGS still must be set before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: shape-bucketed kernels compile once across
# test runs instead of on every invocation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oramacore_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
