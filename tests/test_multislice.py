"""Multiple independent slices per picture (spec 7.3.6.1 / 6.4.1 slice
availability), bit-exact on golden and TPU paths."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls import nal as N
from p265_tpu.hls.bitio import BitWriter
from p265_tpu.hls.params import PPS, SPS, write_pps, write_sps, write_vps
from p265_tpu.hls.slice_header import SLICE_I
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence, make_test_image


def _param_nals(sps, pps):
    out = b""
    for t, wfn, arg in ((N.NAL_VPS, write_vps, None),
                        (N.NAL_SPS, write_sps, sps),
                        (N.NAL_PPS, write_pps, pps)):
        w = BitWriter()
        (wfn(w) if arg is None else wfn(w, arg))
        out += N.make_nal(t, w.get_bytes())
    return out


def test_multislice_intra():
    sps = SPS(pic_width=256, pic_height=128)
    pps = PPS(init_qp=31, sign_data_hiding=True)
    enc = Encoder(sps, pps, qp=31, seed=30)
    img = make_test_image(256, 128, 30)
    nb, plan, prefilter, filtered = enc.encode_frame(
        img, poc=0, slice_type=SLICE_I, num_slices=3)
    stream = _param_nals(sps, pps) + nb
    assert sum(1 for u in N.split_nal_units(stream)
               if N.is_slice_nal(u.nal_type)) == 3
    g = GoldenDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(g.planes[c], filtered[c])
    t = TpuDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(t.planes[c], g.planes[c])


def test_multislice_p_gop():
    sps = SPS(pic_width=192, pic_height=96, temporal_mvp_enabled=True)
    pps = PPS(init_qp=33, sign_data_hiding=True)
    frames = make_moving_sequence(192, 96, 3, seed=31)
    stream, recons = Encoder(sps, pps, qp=33, seed=31).encode_sequence(
        frames, num_slices=2)
    gold = GoldenDecoder().decode_stream(stream)
    for f in gold:
        assert len(set(f.plan.slice_of_ctb.tolist())) == 2
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[f.poc][c])


def test_dependent_slice_segments():
    from p265_tpu.pipeline.decoder import TpuDecoder
    sps = SPS(pic_width=256, pic_height=128)
    pps = PPS(init_qp=31, sign_data_hiding=True,
              dependent_slice_segments_enabled=True)
    enc = Encoder(sps, pps, qp=31, seed=33)
    img = make_test_image(256, 128, 33)
    nb, plan, prefilter, filtered = enc.encode_frame(
        img, poc=0, slice_type=SLICE_I, num_slices=3, dependent_slices=True)
    stream = _param_nals(sps, pps) + nb
    units = [u for u in N.split_nal_units(stream) if N.is_slice_nal(u.nal_type)]
    assert len(units) == 3
    g = GoldenDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(g.planes[c], filtered[c])
    t = TpuDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(t.planes[c], g.planes[c])
