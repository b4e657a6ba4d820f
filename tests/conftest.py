"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path and benchmarks on real TPU hardware.

IMPORTANT: plain ``os.environ.setdefault("JAX_PLATFORMS", "cpu")`` is NOT
enough in this environment — the axon site hook (PYTHONPATH sitecustomize)
imports jax at interpreter start with JAX_PLATFORMS=axon already set, so
jax's config snapshot predates this file. Without the explicit
``jax.config.update`` below, every "8-device mesh" silently collapses to
the ONE tunneled TPU and all sharding becomes degenerate replication.
"""

import os

# XLA_FLAGS is read when the CPU client initializes (first jax.devices()),
# which happens inside the tests — after this file — so env is still
# effective for the device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: the test suite compiles many small
# specialized executables (one per modulus/shape); cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/troy_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402  (already imported by the site hook anyway)

jax.config.update("jax_platforms", "cpu")
