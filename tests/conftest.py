"""Test configuration: run on a virtual 8-device CPU mesh with f64 enabled.

Real-TPU benchmarking happens in bench.py; tests validate numerics (f64 on
CPU) and multi-chip sharding (8 virtual CPU devices), per the driver's
dry-run pattern.
"""

import os

# Env vars for any fresh subprocess; the config.update calls below are what
# actually matters when jax was already imported by site customization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of f64 programs in one process; on
    this image the XLA CPU compiler segfaulted twice (same position,
    backend_compile_and_load, 125 GB free RAM) compiling the pscan
    engine program late in the suite — with per-module cache clearing
    the suite completes. Modules rarely share compilations (different
    cfg/dtype), so the runtime cost is small.
    """
    yield
    jax.clear_caches()
