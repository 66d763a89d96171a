"""TPU pipeline (Stage B) vs golden decoder: bit-exact end to end."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import IntraEncoder, make_test_image


def _compare(w, h, qp, seed, **enc_kw):
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    img = make_test_image(w, h, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed, **enc_kw).encode_frame(img)
    gold = GoldenDecoder().decode_stream(stream)[0]
    tpu = TpuDecoder().decode_stream(stream)[0]
    _, planes, prefilter, _ = tpu
    for c in range(3):
        assert np.array_equal(prefilter[c], gold.prefilter[c]), f"prefilter {c}"
        assert np.array_equal(planes[c], gold.planes[c]), f"filtered {c}"


def test_tpu_matches_golden_128():
    _compare(128, 128, 30, 11)


def test_tpu_matches_golden_nonaligned():
    _compare(104, 56, 26, 21)


def test_tpu_matches_golden_highqp():
    _compare(64, 64, 45, 31)


def test_tpu_int32_path():
    sps = SPS(pic_width=64, pic_height=64)
    pps = PPS(init_qp=30)
    img = make_test_image(64, 64, 5)
    stream, _, _ = IntraEncoder(sps, pps, qp=30, seed=5).encode_frame(img)
    gold = GoldenDecoder().decode_stream(stream)[0]
    tpu = TpuDecoder(use_mxu=False).decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(tpu[1][c], gold.planes[c])
