"""End-to-end config-1 round trip: testgen encode -> golden decode, bit-exact."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder, apply_loop_filters
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.testgen.encoder import IntraEncoder, make_test_image


def _run_roundtrip(w, h, qp, seed, *, sao=True, deblock=True, sdh=False,
                   tskip=False, full_search=False):
    sps = SPS(pic_width=w, pic_height=h, sao_enabled=sao)
    pps = PPS(init_qp=qp, sign_data_hiding=sdh, transform_skip_enabled=tskip)
    if not deblock:
        pps.deblocking_filter_control_present = True
        pps.deblocking_filter_disabled = True
    enc = IntraEncoder(sps, pps, qp=qp, seed=seed, full_mode_search=full_search)
    img = make_test_image(w, h, seed)
    stream, plan, enc_recon = enc.encode_frame(img)

    dec = GoldenDecoder()
    frames = dec.decode_stream(stream)
    assert len(frames) == 1
    f = frames[0]
    # pre-filter recon must match encoder's recon exactly
    for c in range(3):
        assert np.array_equal(f.prefilter[c], enc_recon[c]), f"plane {c} prefilter"
    # post-filter: apply the same filters to the encoder's recon
    enc_filtered = apply_loop_filters(plan, [p.copy() for p in enc_recon])
    for c in range(3):
        assert np.array_equal(f.planes[c], enc_filtered[c]), f"plane {c} filtered"
    return stream, f, img


def test_tiny_no_filters():
    stream, f, img = _run_roundtrip(64, 64, 32, 1, sao=False, deblock=False)
    assert f.planes[0].shape == (64, 64)


def test_tiny_with_filters():
    _run_roundtrip(64, 64, 30, 2)


def test_config1_416x240():
    stream, f, img = _run_roundtrip(416, 240, 32, 3)
    # sanity: decode resembles the input (lossy but correlated)
    err = np.abs(f.planes[0].astype(np.int64) - img[0]).mean()
    assert err < 16, err


def test_sdh_and_tskip():
    _run_roundtrip(96, 64, 28, 4, sdh=True, tskip=True)


def test_low_qp_high_quality():
    stream, f, img = _run_roundtrip(64, 64, 8, 5)
    err = np.abs(f.prefilter[0].astype(np.int64) - img[0]).mean()
    assert err < 2.5, err


def test_nonaligned_dimensions():
    # 104x56: multiple of min CB (8) but not of CTB (64) -> boundary forced splits
    _run_roundtrip(104, 56, 30, 6)
