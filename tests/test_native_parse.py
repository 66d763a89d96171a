"""Native whole-CTU Stage-A parser (native/ctu.c) vs the Python parser.

Two independently written parsers must produce bit-exact YUV: GoldenDecoder
parses with the Python CtuCoder (+ native residual lane) and reconstructs
scalar; TpuDecoder parses with the native per-CTU C parser (emitting tensor
buckets directly) and reconstructs on the device.  Any divergence in SAO
params, quadtree walk, MPM, QP derivation, residuals, or wavefront schedule
shows up as a pixel mismatch.
"""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import (PPS, SPS, default_scaling_list)
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import Encoder, IntraEncoder, make_test_image
from p265_tpu.native import parse as nparse

pytestmark = pytest.mark.skipif(not nparse.native_parse_available(),
                                reason="no C compiler for native lane")


def _check(sps, pps, seed=7, qp=None, expect_native=True, **enc_kw):
    qp = pps.init_qp if qp is None else qp
    img = make_test_image(sps.pic_width, sps.pic_height, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed,
                                **enc_kw).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    t = TpuDecoder().decode_stream(stream)[0]
    assert (getattr(t.plan, "nstate", None) is not None) == expect_native
    for c in range(3):
        assert np.array_equal(g.prefilter[c], np.asarray(t.prefilter[c])), c
        assert np.array_equal(g.planes[c], np.asarray(t.planes[c])), c
    return g, t


def test_basic_416x240():
    _check(SPS(pic_width=416, pic_height=240),
           PPS(init_qp=32, sign_data_hiding=True))


def test_full_mode_search_all_modes():
    _check(SPS(pic_width=128, pic_height=64),
           PPS(init_qp=27, sign_data_hiding=True), full_mode_search=True)


@pytest.mark.parametrize("qp", [8, 22, 45])
def test_qp_sweep(qp):
    _check(SPS(pic_width=104, pic_height=56), PPS(init_qp=qp))


def test_wpp():
    _check(SPS(pic_width=256, pic_height=128),
           PPS(init_qp=31, sign_data_hiding=True,
               entropy_coding_sync_enabled=True))


def test_tiles():
    _check(SPS(pic_width=256, pic_height=128),
           PPS(init_qp=31, sign_data_hiding=True, tiles_enabled=True,
               num_tile_columns=2, num_tile_rows=2))


def test_cu_qp_delta():
    _check(SPS(pic_width=128, pic_height=128),
           PPS(init_qp=30, cu_qp_delta_enabled=True,
               diff_cu_qp_delta_depth=2))


def test_transquant_bypass():
    g, t = _check(SPS(pic_width=96, pic_height=64),
                  PPS(init_qp=30, transquant_bypass_enabled=True), seed=3)
    assert g.plan.bypass_map.any()


def test_scaling_lists():
    sld = default_scaling_list
    sps = SPS(pic_width=96, pic_height=64, scaling_list_enabled=True,
              scaling_list_data=None)
    _check(sps, PPS(init_qp=28))


def test_no_sao_no_deblock():
    pps = PPS(init_qp=30)
    pps.deblocking_filter_control_present = True
    pps.deblocking_filter_disabled = True
    _check(SPS(pic_width=96, pic_height=64, sao_enabled=False), pps)


def test_pcm_falls_back_to_python():
    # PCM is not supported natively; the decoder must fall back and still be
    # bit-exact through the Python parser
    _check(SPS(pic_width=96, pic_height=64, pcm_enabled=True,
               pcm_loop_filter_disabled=True),
           PPS(init_qp=30), seed=4, expect_native=False)


def test_multislice_intra():
    from p265_tpu.hls import nal as N
    from p265_tpu.hls.bitio import BitWriter
    from p265_tpu.hls.params import write_pps, write_sps, write_vps
    from p265_tpu.hls.slice_header import SLICE_I
    sps = SPS(pic_width=256, pic_height=128)
    pps = PPS(init_qp=31, sign_data_hiding=True)
    enc = Encoder(sps, pps, qp=31, seed=30)
    img = make_test_image(256, 128, 30)
    stream = b""
    for t_, wfn, arg in ((N.NAL_VPS, write_vps, None),
                         (N.NAL_SPS, write_sps, sps),
                         (N.NAL_PPS, write_pps, pps)):
        w = BitWriter()
        (wfn(w) if arg is None else wfn(w, arg))
        stream += N.make_nal(t_, w.get_bytes())
    nb, *_ = enc.encode_frame(img, poc=0, slice_type=SLICE_I, num_slices=3)
    stream += nb
    g = GoldenDecoder().decode_stream(stream)[0]
    t = TpuDecoder().decode_stream(stream)[0]
    assert t.plan.nstate is not None
    for c in range(3):
        assert np.array_equal(g.planes[c], np.asarray(t.planes[c])), c


def test_intra_sequence_all_i():
    # several I frames through the DPB/output path
    from p265_tpu.testgen.encoder import make_moving_sequence
    sps = SPS(pic_width=96, pic_height=64)
    pps = PPS(init_qp=30, sign_data_hiding=True)
    from p265_tpu.hls import nal as N
    from p265_tpu.hls.bitio import BitWriter
    from p265_tpu.hls.params import write_pps, write_sps
    frames = make_moving_sequence(96, 64, 3, seed=11)
    enc = Encoder(sps, pps, qp=30, seed=11)
    stream = b""
    w = BitWriter(); write_sps(w, sps)
    stream += N.make_nal(N.NAL_SPS, w.get_bytes())
    w = BitWriter(); write_pps(w, pps)
    stream += N.make_nal(N.NAL_PPS, w.get_bytes())
    for f in frames:
        nb, *_ = enc.encode_frame(f, poc=0, slice_type=2)
        stream += nb
    g = GoldenDecoder().decode_stream(stream)
    t = TpuDecoder().decode_stream(stream)
    assert len(g) == len(t) == 3
    for gf, tf in zip(g, t):
        for c in range(3):
            assert np.array_equal(gf.planes[c], np.asarray(tf.planes[c])), c
