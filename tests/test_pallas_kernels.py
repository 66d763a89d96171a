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


def test_pallas_mc_windows_bit_exact_interpret():
    """kernels/pallas_mc (DMA'd aligned covering tiles + in-register
    rolls) matches the XLA MC formulation bit-exactly for every bucket
    geometry, interpret mode (chip numbers: 1.2-1.7x standalone over the
    per-element gather; kept experimental -- the shipping path uses the
    XLA slice gather, see NOTES_ROUND6)."""
    import numpy as np
    import jax.numpy as jnp
    from p265_tpu.kernels.mc import _mc_blocks, MC_PAD
    from p265_tpu.kernels.pallas_mc import extra_pad, mc_blocks_pallas
    from p265_tpu.tables import CHROMA_FILTER, LUMA_FILTER

    rng = np.random.default_rng(17)
    H, W, R = 96, 160, 2
    eb, er = extra_pad()
    refs = rng.integers(0, 255, (R, H, W)).astype(np.int32)
    P = MC_PAD
    refs_p = jnp.asarray(np.pad(
        refs, ((0, 0), (P, P + eb), (P, P + er)),
        mode="edge").astype(np.uint8))
    for block, taps in ((16, 8), (8, 8), (4, 8), (8, 4), (4, 4), (2, 4)):
        n = 32
        span = block + taps - 1
        filt = np.asarray(LUMA_FILTER if taps == 8 else CHROMA_FILTER,
                          np.int32)
        fmask = 3 if taps == 8 else 7
        unit = 2 if taps == 8 else 3
        half = taps // 2 - 1
        pos = np.stack([rng.integers(0, H - block, n),
                        rng.integers(0, W - block, n)], 1).astype(np.int32)
        mv = rng.integers(-30, 30, (n, 2)).astype(np.int32)
        ridx = rng.integers(0, R, n).astype(np.int32)
        ff = np.stack([filt[mv[:, 0] & fmask], filt[mv[:, 1] & fmask]], 1)
        want = np.asarray(_mc_blocks(
            jnp.asarray(refs), jnp.asarray(pos), jnp.asarray(ridx),
            jnp.asarray(mv), jnp.asarray(ff), block, taps, R))
        iy = (pos[:, 0] + (mv[:, 1] >> unit) - half + P).astype(np.int32)
        ix = (pos[:, 1] + (mv[:, 0] >> unit) - half + P).astype(np.int32)
        got = np.asarray(mc_blocks_pallas(
            refs_p, jnp.asarray(iy), jnp.asarray(ix), jnp.asarray(ridx),
            jnp.asarray(np.ascontiguousarray(ff[:, 0])),
            jnp.asarray(np.ascontiguousarray(ff[:, 1])), block, taps,
            interpret=True))
        over_y = np.maximum(0, np.maximum(
            -(pos[:, 0] + (mv[:, 1] >> unit) - half),
            pos[:, 0] + (mv[:, 1] >> unit) - half + span - H))
        over_x = np.maximum(0, np.maximum(
            -(pos[:, 1] + (mv[:, 0] >> unit) - half),
            pos[:, 1] + (mv[:, 0] >> unit) - half + span - W))
        ok = (over_y <= P) & (over_x <= P)
        assert ok.any()
        assert np.array_equal(want[ok], got[ok]), (block, taps)
