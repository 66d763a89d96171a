"""Pipelined (parse || recon) decoder == sequential, bit-exact."""
import numpy as np

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.async_decoder import PipelinedTpuDecoder
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence


def test_pipelined_matches_golden_ra():
    sps = SPS(pic_width=96, pic_height=64, temporal_mvp_enabled=True,
              num_reorder_pics=2, max_dec_pic_buffering=5)
    pps = PPS(init_qp=32, sign_data_hiding=True)
    frames = make_moving_sequence(96, 64, 9, seed=50)
    stream, _ = Encoder(sps, pps, qp=32, seed=50).encode_sequence(
        frames, structure="RA")
    gold = GoldenDecoder().decode_stream(stream)
    pipe = PipelinedTpuDecoder().decode_stream(stream)
    assert [f.poc for f in pipe] == [f.poc for f in gold]
    for p, g in zip(pipe, gold):
        for c in range(3):
            assert np.array_equal(p.planes[c], g.planes[c])
