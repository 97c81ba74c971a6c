"""Test configuration: force an 8-device virtual CPU platform.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware.

Note: this environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon already set, so env-var edits here are too late for
jax's config snapshot - use jax.config.update instead (backends initialize
lazily, on first use).
"""
import os

# XLA_FLAGS is read at (lazy) CPU-client creation, so setting it here works
# as long as no computation ran yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")
