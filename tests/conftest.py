"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax init.

SURVEY.md section 4.2 [VERIFIED]: in this axon-PJRT environment the
XLA_FLAGS=--xla_force_host_platform_device_count route does NOT work; the
config API below does, and must run before first device use.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if "jax" in sys.modules:
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults deterministically (jaxlib 0.9, this host) once a
    single process accumulates a few hundred compiled programs: 3/3 full-
    suite runs died inside backend_compile_and_load at the same test while
    every file passes alone.  Dropping the compiled-computation caches
    between modules bounds the accumulation; the lost cache hits cost a
    few extra small compiles per module."""
    yield
    try:
        import jax
        jax.clear_caches()
    except Exception:
        pass
