"""Test configuration: run all tests on a virtual 8-device CPU mesh so that
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment's axon TPU integration force-sets JAX_PLATFORMS=axon
during ``import jax``, so the env var alone is not enough — the config update
after import is what actually pins the tests to CPU.
"""

import os
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# amortize the engine's XLA compiles across test runs
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
