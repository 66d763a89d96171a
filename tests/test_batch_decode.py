"""Single-dispatch batch decoder (pipeline/batch_decode) vs golden."""
import numpy as np

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.batch_decode import decode_batch
from p265_tpu.plan.frame_plan import build_tensor_plan
from p265_tpu.testgen.encoder import IntraEncoder, make_test_image


def _mk(seed, w=128, h=64, qp=30, **enc_kw):
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    img = make_test_image(w, h, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed,
                                **enc_kw).encode_frame(img)
    return GoldenDecoder().decode_stream(stream)[0]


def test_batch_intra_bit_exact():
    golds = [_mk(s) for s in range(3)]
    tplans = [build_tensor_plan(g.plan) for g in golds]
    pre, filt = decode_batch(tplans, [g.plan for g in golds])
    for g, p3, f3 in zip(golds, pre, filt):
        for c in range(3):
            assert np.array_equal(np.asarray(p3[c]), g.prefilter[c]), c
            assert np.array_equal(np.asarray(f3[c]), g.planes[c]), c


def test_batch_single_frame():
    g = _mk(7, w=96, h=48)
    tplans = [build_tensor_plan(g.plan)]
    pre, filt = decode_batch(tplans, [g.plan])
    for c in range(3):
        assert np.array_equal(np.asarray(filt[0][c]), g.planes[c]), c
