"""PCM, transquant bypass, weighted prediction round trips (SURVEY.md 2)."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder, apply_loop_filters
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import (Encoder, IntraEncoder,
                                      make_moving_sequence, make_test_image)


def test_transquant_bypass_lossless_cus():
    sps = SPS(pic_width=96, pic_height=64)
    pps = PPS(init_qp=30, transquant_bypass_enabled=True)
    img = make_test_image(96, 64, 3)
    stream, plan, rec = IntraEncoder(sps, pps, qp=30, seed=3).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    assert any(t.bypass for t in g.plan.tus)
    for c in range(3):
        assert np.array_equal(g.prefilter[c], rec[c])
    # bypass CUs are lossless: their samples equal the source exactly
    bm = np.repeat(np.repeat(g.plan.bypass_map.astype(bool), 4, 0), 4, 1)[:64, :96]
    assert bm.any()
    assert np.array_equal(g.prefilter[0][bm], img[0][bm])
    t = TpuDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(t.planes[c], g.planes[c])


def test_pcm_roundtrip():
    sps = SPS(pic_width=96, pic_height=64, pcm_enabled=True,
              pcm_loop_filter_disabled=True)
    pps = PPS(init_qp=30)
    img = make_test_image(96, 64, 4)
    stream, plan, rec = IntraEncoder(sps, pps, qp=30, seed=4).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    pcm_tus = [t for t in g.plan.tus if t.pcm]
    assert pcm_tus
    for c in range(3):
        assert np.array_equal(g.prefilter[c], rec[c])
    enc_f = apply_loop_filters(plan, [p.copy() for p in rec])
    for c in range(3):
        assert np.array_equal(g.planes[c], enc_f[c])
    # PCM samples decode to the (depth-truncated) source exactly
    t0 = pcm_tus[0]
    sz = 1 << t0.log2
    assert np.array_equal(g.prefilter[0][t0.y:t0.y + sz, t0.x:t0.x + sz],
                          img[0][t0.y:t0.y + sz, t0.x:t0.x + sz])
    t = TpuDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(t.planes[c], g.planes[c])


def test_weighted_prediction_ra():
    sps = SPS(pic_width=96, pic_height=64, temporal_mvp_enabled=True,
              num_reorder_pics=2, max_dec_pic_buffering=5)
    pps = PPS(init_qp=32, sign_data_hiding=True, weighted_pred=True,
              weighted_bipred=True)
    frames = make_moving_sequence(96, 64, 5, seed=14)
    stream, recons = Encoder(sps, pps, qp=32, seed=14).encode_sequence(
        frames, structure="RA")
    gold = GoldenDecoder().decode_stream(stream)
    assert any(f.plan.sh.pred_weights is not None for f in gold)
    for f in gold:
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[f.poc][c])
    tpu = TpuDecoder().decode_stream(stream)
    for t, g in zip(tpu, gold):
        for c in range(3):
            assert np.array_equal(t.planes[c], g.planes[c])
