"""On-hardware smoke tier (VERDICT.md round-1 Weak #3).

The main suite is pinned to the virtual CPU mesh (conftest.py), where Pallas
kernels only run in interpret mode -- which round 1 proved does NOT transfer
to Mosaic.  These tests spawn subprocesses WITHOUT the CPU pin so they hit
the real accelerator; they are skipped unless RUN_TPU_SMOKE=1 (they pay
real-chip compile latency and need the axon tunnel).

Run manually before any perf claim / before enabling optional kernels:
    RUN_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -v
or equivalently: python tools/tpu_smoke.py
"""
import os
import pathlib
import subprocess
import sys

import pytest

_SMOKE = pathlib.Path(__file__).resolve().parent.parent / "tools" / "tpu_smoke.py"

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_TPU_SMOKE") != "1",
    reason="on-hardware smoke tier; set RUN_TPU_SMOKE=1 to run")


def _run(path_name: str):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    r = subprocess.run([sys.executable, str(_SMOKE), path_name], timeout=1200,
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, (r.stdout or "") + (r.stderr or "")[-4000:]


def test_tpu_xla_intra_path():
    _run("xla_intra")


def test_tpu_inter_mc_path():
    _run("inter_mc")


def test_tpu_pallas_residual_path():
    _run("presid")
