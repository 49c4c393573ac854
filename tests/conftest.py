"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
exercised without TPU hardware, and with x64 enabled so float64 oracle
comparisons are meaningful.  Must run before the first ``import jax``.
"""

import os
import sys

# The container's sitecustomize registers the axon TPU plugin and latches
# JAX_PLATFORMS=axon before any conftest runs, so the env var alone is not
# enough -- use the runtime config override as well.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
