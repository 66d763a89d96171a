"""Pallas kernels vs golden/XLA paths (interpret mode on the CPU backend)."""
import numpy as np
import pytest

from p265_tpu.kernels.itransform import batch_residual
from p265_tpu.kernels.pallas_itransform import pallas_batch_residual


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_pallas_residual_bit_exact(log2):
    rng = np.random.default_rng(log2)
    s = 1 << log2
    n = 150  # forces padding to the 128-TU block size
    lv = ((rng.random((n, s, s)) < 0.2)
          * rng.integers(-200, 200, (n, s, s))).astype(np.int32)
    lv[:5] = rng.integers(-32768, 32768, (5, s, s))
    qp = rng.integers(0, 52, n).astype(np.int32)
    dstf = (rng.random(n) < 0.4) if log2 == 2 else np.zeros(n, bool)
    tsf = ((rng.random(n) < 0.3) & ~dstf) if log2 == 2 else np.zeros(n, bool)
    byp = rng.random(n) < 0.15
    want = np.asarray(batch_residual(lv, qp, dstf, tsf, log2, True, bypass=byp))
    got = np.asarray(pallas_batch_residual(lv, qp, dstf, tsf, byp, log2,
                                           interpret=True))
    assert np.array_equal(got, want)
