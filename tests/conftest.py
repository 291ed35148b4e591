"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so that
sharding tests can exercise multi-chip layouts without TPU hardware.
"""
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# persistent XLA compile cache so repeated test runs don't recompile kernels
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and the env var
# override is ignored by the plugin, so force the CPU platform via config.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
