"""cu_qp_delta: per-CU QP with quantization groups (spec 7.3.8.10, 8.6.1)."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import (Encoder, IntraEncoder,
                                      make_moving_sequence, make_test_image)


def test_cu_qp_delta_intra():
    sps = SPS(pic_width=128, pic_height=64)
    pps = PPS(init_qp=30, cu_qp_delta_enabled=True, diff_cu_qp_delta_depth=2,
              sign_data_hiding=True)
    img = make_test_image(128, 64, 9)
    stream, plan, rec = IntraEncoder(sps, pps, qp=30, seed=9).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    assert len(set(g.plan.qp_map.ravel().tolist())) > 1, "QP should vary"
    for c in range(3):
        assert np.array_equal(g.prefilter[c], rec[c])
    t = TpuDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(t.planes[c], g.planes[c])


def test_cu_qp_delta_inter_gop():
    sps = SPS(pic_width=96, pic_height=64, temporal_mvp_enabled=True)
    pps = PPS(init_qp=32, cu_qp_delta_enabled=True, diff_cu_qp_delta_depth=1)
    frames = make_moving_sequence(96, 64, 3, seed=19)
    stream, recons = Encoder(sps, pps, qp=32, seed=19).encode_sequence(frames)
    gold = GoldenDecoder().decode_stream(stream)
    for f in gold:
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[f.poc][c])


def test_ref_list_modification():
    sps = SPS(pic_width=96, pic_height=64, temporal_mvp_enabled=True)
    pps = PPS(init_qp=32, lists_modification_present=True)
    frames = make_moving_sequence(96, 64, 4, seed=21)
    stream, recons = Encoder(sps, pps, qp=32, seed=21).encode_sequence(
        frames, structure="LDP2")
    gold = GoldenDecoder().decode_stream(stream)
    assert any(f.plan.sh.ref_pic_list_modification_l0 for f in gold)
    for f in gold:
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[f.poc][c])
