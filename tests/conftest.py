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
