"""residual_coding encode->decode round-trip property tests."""
import numpy as np
import pytest

from p265_tpu.entropy.engine import CabacDecoder, CabacEncoder, ContextModels
from p265_tpu.hls.bitio import BitReader, BitWriter
from p265_tpu.syntax.residual import (apply_sign_data_hiding, decode_residual,
                                      encode_residual, tb_scan)


def _random_levels(rng, size, density, mag):
    lv = np.zeros((size, size), np.int32)
    n = max(1, int(size * size * density))
    ys = rng.integers(0, size, n)
    xs = rng.integers(0, size, n)
    vals = rng.integers(1, mag + 1, n) * rng.choice([-1, 1], n)
    lv[ys, xs] = vals
    if not lv.any():
        lv[0, 0] = 1
    return lv


def _roundtrip_tus(tus, sdh=False, tskip_allowed=False):
    """tus: list of (levels, log2, c_idx, scan_idx, tskip). One CABAC stream."""
    w = BitWriter()
    enc = CabacEncoder(w, ContextModels(0, 26))
    for levels, log2, c_idx, scan_idx, tskip in tus:
        encode_residual(enc, levels, log2, c_idx, scan_idx,
                        transform_skip_allowed=tskip_allowed,
                        sign_data_hiding=sdh, tq_bypass=False, tskip=tskip)
    enc.encode_terminate(1)
    w.rbsp_trailing_bits()
    dec = CabacDecoder(BitReader(w.get_bytes()), ContextModels(0, 26))
    out = []
    for levels, log2, c_idx, scan_idx, tskip in tus:
        got, got_tskip = decode_residual(
            dec, log2, c_idx, scan_idx,
            transform_skip_allowed=tskip_allowed,
            sign_data_hiding=sdh, tq_bypass=False)
        assert got_tskip == (tskip if (tskip_allowed and log2 == 2) else False)
        out.append(got)
    assert dec.decode_terminate() == 1
    return out


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_roundtrip_sizes_scans(log2, scan_idx):
    if log2 > 3 and scan_idx != 0:
        pytest.skip("h/v scans only exist for small TBs")
    rng = np.random.default_rng(log2 * 10 + scan_idx)
    size = 1 << log2
    tus = []
    for c_idx in (0, 1, 2):
        for density in (0.05, 0.3, 0.9):
            lv = _random_levels(rng, size, density, 40)
            tus.append((lv, log2, c_idx, scan_idx, False))
    got = _roundtrip_tus(tus)
    for (want, *_), g in zip(tus, got):
        assert np.array_equal(want, g)


def test_roundtrip_single_dc():
    for v in (1, -1, 2, -3, 100, -32000):
        lv = np.zeros((8, 8), np.int32)
        lv[0, 0] = v
        got = _roundtrip_tus([(lv, 3, 0, 0, False)])[0]
        assert np.array_equal(lv, got)


def test_roundtrip_single_highfreq():
    lv = np.zeros((32, 32), np.int32)
    lv[31, 31] = -7
    got = _roundtrip_tus([(lv, 5, 0, 0, False)])[0]
    assert np.array_equal(lv, got)


def test_roundtrip_large_magnitudes():
    rng = np.random.default_rng(5)
    lv = _random_levels(rng, 16, 0.5, 30000)
    got = _roundtrip_tus([(lv, 4, 0, 0, False)])[0]
    assert np.array_equal(lv, got)


def test_roundtrip_dense_ones():
    lv = np.ones((8, 8), np.int32)
    lv[::2, 1::2] = -1
    got = _roundtrip_tus([(lv, 3, 1, 0, False)])[0]
    assert np.array_equal(lv, got)


def test_transform_skip_flag_roundtrip():
    rng = np.random.default_rng(11)
    lv = _random_levels(rng, 4, 0.5, 5)
    for ts in (False, True):
        got = _roundtrip_tus([(lv, 2, 0, 0, ts)], tskip_allowed=True)[0]
        assert np.array_equal(lv, got)


def test_sign_data_hiding_roundtrip():
    rng = np.random.default_rng(13)
    for trial in range(30):
        size = int(rng.choice([4, 8, 16, 32]))
        log2 = size.bit_length() - 1
        lv = _random_levels(rng, size, 0.4, 12)
        lv = apply_sign_data_hiding(lv, log2, 0)
        if not lv.any():
            continue
        got = _roundtrip_tus([(lv, log2, 0, 0, False)], sdh=True)[0]
        assert np.array_equal(lv, got), trial


def test_tb_scan_covers_all():
    for scan_idx in (0, 1, 2):
        for size in (4, 8):
            s = tb_scan(scan_idx, size)
            assert len({(int(x), int(y)) for x, y in s}) == size * size
    s32 = tb_scan(0, 32)
    assert len({(int(x), int(y)) for x, y in s32}) == 1024
    # first CG of 8x8 diag is the top-left 4x4 region
    s8 = tb_scan(0, 8)
    assert set(map(tuple, s8[:16].tolist())) == {(x, y) for x in range(4) for y in range(4)}
