"""Device MC kernel == golden MC (8/4-tap, bi-pred, weighted prediction)."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.golden.recon import build_inter_pred
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.kernels.mc import build_inter_pred_device
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence


def test_device_mc_matches_golden():
    sps = SPS(pic_width=96, pic_height=64, temporal_mvp_enabled=True,
              num_reorder_pics=2, max_dec_pic_buffering=5)
    pps = PPS(init_qp=32, sign_data_hiding=True, weighted_pred=True,
              weighted_bipred=True)
    frames = make_moving_sequence(96, 64, 5, seed=40)
    stream, _ = Encoder(sps, pps, qp=32, seed=40).encode_sequence(
        frames, structure="RA")
    gold = GoldenDecoder().decode_stream(stream)
    refs = {f.poc: f.planes for f in gold}
    checked = 0
    for f in gold:
        if not f.plan.pus:
            continue
        want = build_inter_pred(f.plan, refs)
        got = build_inter_pred_device(f.plan, refs)
        for c in range(3):
            assert np.array_equal(want[c], got[c]), (f.poc, c)
        checked += 1
    assert checked >= 3


def test_tpu_decoder_uses_device_mc_bit_exact():
    sps = SPS(pic_width=96, pic_height=64, temporal_mvp_enabled=True)
    pps = PPS(init_qp=33, sign_data_hiding=True)
    frames = make_moving_sequence(96, 64, 3, seed=41)
    stream, recons = Encoder(sps, pps, qp=33, seed=41).encode_sequence(frames)
    gold = GoldenDecoder().decode_stream(stream)
    tpu = TpuDecoder().decode_stream(stream)
    for t, g in zip(tpu, gold):
        for c in range(3):
            assert np.array_equal(t.planes[c], g.planes[c])
