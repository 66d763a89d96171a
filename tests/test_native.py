"""Native C CABAC lane == pure-Python reference engine, byte-exact."""
import numpy as np
import pytest

from p265_tpu import native
from p265_tpu.entropy.engine import CabacDecoder, CabacEncoder, ContextModels
from p265_tpu.hls.bitio import BitReader, BitWriter

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler available")


def test_engine_agreement_random_bins():
    rng = np.random.default_rng(0)
    from p265_tpu.tables import NUM_CTX
    ops = []
    w = BitWriter()
    enc = CabacEncoder(w, ContextModels(1, 30))
    for _ in range(3000):
        kind = ("ctx", "byp")[int(rng.random() < 0.4)]
        idx = int(rng.integers(0, NUM_CTX))
        b = int(rng.integers(0, 2))
        ops.append((kind, idx, b))
        if kind == "ctx":
            enc.encode_bin(idx, b)
        else:
            enc.encode_bypass(b)
    enc.encode_terminate(1)
    w.rbsp_trailing_bits()
    data = w.get_bytes()

    py = CabacDecoder(BitReader(data), ContextModels(1, 30))
    nc = native.NativeCabacDecoder(BitReader(data),
                                   native.NativeContextModels(1, 30))
    for kind, idx, b in ops:
        if kind == "ctx":
            assert py.decode_bin(idx) == nc.decode_bin(idx) == b
        else:
            assert py.decode_bypass() == nc.decode_bypass() == b
    assert py.decode_terminate() == nc.decode_terminate() == 1
    # context state must match exactly
    assert list(nc.ctx.state) == py.ctx.state
    assert list(nc.ctx.mps) == py.ctx.mps


def test_native_residual_agreement():
    from p265_tpu.syntax.residual import encode_residual
    rng = np.random.default_rng(7)
    tus = []
    for _ in range(40):
        log2 = int(rng.choice([2, 3, 4, 5]))
        size = 1 << log2
        c_idx = int(rng.integers(0, 3))
        scan = int(rng.integers(0, 3)) if log2 <= 3 else 0
        lv = np.zeros((size, size), np.int32)
        n = max(1, int(size * size * rng.random() * 0.5))
        lv[rng.integers(0, size, n), rng.integers(0, size, n)] = \
            rng.integers(1, 50, n) * rng.choice([-1, 1], n)
        if not lv.any():
            lv[0, 0] = 1
        tus.append((lv, log2, c_idx, scan))
    w = BitWriter()
    enc = CabacEncoder(w, ContextModels(0, 28))
    for lv, log2, c_idx, scan in tus:
        encode_residual(enc, lv, log2, c_idx, scan,
                        transform_skip_allowed=True, sign_data_hiding=False,
                        tq_bypass=False, tskip=False)
    enc.encode_terminate(1)
    w.rbsp_trailing_bits()
    data = w.get_bytes()

    nc = native.NativeCabacDecoder(BitReader(data),
                                   native.NativeContextModels(0, 28))
    for lv, log2, c_idx, scan in tus:
        got, tskip = nc.native_residual(log2, c_idx, scan, True, False, False)
        assert not tskip
        assert np.array_equal(got, lv)
    assert nc.decode_terminate() == 1


def test_native_decoder_full_stream():
    from p265_tpu.golden.decoder import GoldenDecoder
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.testgen.encoder import Encoder, make_moving_sequence
    sps = SPS(pic_width=96, pic_height=64, temporal_mvp_enabled=True)
    pps = PPS(init_qp=32, sign_data_hiding=True)
    frames = make_moving_sequence(96, 64, 3, seed=17)
    stream, recons = Encoder(sps, pps, qp=32, seed=17).encode_sequence(frames)
    g_py = GoldenDecoder(use_native_cabac=False).decode_stream(stream)
    g_nc = GoldenDecoder(use_native_cabac=True).decode_stream(stream)
    for a, b in zip(g_py, g_nc):
        for c in range(3):
            assert np.array_equal(a.planes[c], b.planes[c])
