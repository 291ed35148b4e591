"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so that
sharding tests can exercise multi-chip layouts without TPU hardware.

Hardware runs: ``DVBT2_TEST_TPU=1 python -m pytest tests/test_ldpc_pallas.py
tests/test_tpu_hw.py`` keeps the session on the real chip (the TPU-marked
tests un-skip; most CPU-mesh tests assume 8 virtual devices — run only the
TPU files).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# persistent XLA compile cache so repeated test runs don't recompile kernels
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

if os.environ.get("DVBT2_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and the env
    # var override is ignored by the plugin, so force the CPU platform via
    # config BEFORE the backend initializes (irreversible afterwards)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax  # noqa: E402
    jax.config.update("jax_platforms", "cpu")
