"""Test configuration: force an 8-virtual-device CPU backend BEFORE jax imports.

This is the TPU-world "fake backend": multi-chip sharding tests run against
``--xla_force_host_platform_device_count=8`` so shard_map / pjit collectives are
exercised without a pod slice. Must execute before anything imports jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # never run unit tests on the real chip
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A sitecustomize on this machine may import jax at interpreter startup (before
# this conftest), in which case the env vars above are too late — force the
# platform through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
