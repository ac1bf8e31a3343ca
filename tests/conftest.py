"""Test configuration: force CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding correctness is tested on
a virtual 8-device CPU mesh (SURVEY.md §4 "Distributed testing": the
reference's P=1 vs P=4 mpirun equivalence becomes a 1-device vs 8-device
shard_map equivalence here).

NOTE: this environment's sitecustomize imports jax at interpreter startup
and pins JAX_PLATFORMS=axon (the TPU tunnel), so plain env-var assignment
here is too late — we must go through jax.config.update.  XLA_FLAGS is still
honoured because the CPU backend has not been instantiated yet at conftest
import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
