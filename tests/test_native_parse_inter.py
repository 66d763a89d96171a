"""Native P/B-slice Stage-A parser (native/ctu.c inter syntax + the
replay_motion merge/AMVP re-derivation) vs the Python parser.

Same two-independent-parsers contract as test_native_parse.py: GoldenDecoder
parses with the Python CtuCoder and reconstructs scalar; TpuDecoder parses
with the native per-CTU C parser (PU syntax recorded as events, motion
derived in replay) and reconstructs on the device.  Any divergence in inter
CU/PU syntax, part modes, mvd/ref-idx/mvp parsing, merge/AMVP replay
ordering, TMVP, or the inter TU wavefront placement shows up as a pixel
mismatch.
"""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.native import parse as nparse
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence

pytestmark = pytest.mark.skipif(not nparse.native_parse_available(),
                                reason="no C compiler for native lane")


def _check(w, h, n, structure, pps_kw=None, sps_kw=None, num_slices=1,
           qp=32, seed=5):
    sps = SPS(pic_width=w, pic_height=h, **(sps_kw or {}))
    pps = PPS(init_qp=qp, sign_data_hiding=True, **(pps_kw or {}))
    frames = make_moving_sequence(w, h, n, seed=seed)
    stream, _ = Encoder(sps, pps, qp=qp, seed=seed).encode_sequence(
        frames, structure, num_slices=num_slices)
    gold = GoldenDecoder().decode_stream(stream)
    got = TpuDecoder().decode_stream(stream)
    assert len(got) == len(gold) == n
    for f, g in zip(got, gold):
        assert getattr(f.plan, "nstate", None) is not None, \
            ("fell back to Python parse", f.poc)
        for c in range(3):
            assert np.array_equal(np.asarray(f.planes[c]), g.planes[c]), \
                (f.poc, c)


def test_ldp():
    _check(96, 64, 4, "LDP")


def test_ra_bgop():
    _check(96, 64, 6, "RA")


def test_ldp2_two_refs():
    _check(96, 64, 4, "LDP2")


def test_ldp_wpp():
    _check(160, 96, 3, "LDP",
           pps_kw=dict(entropy_coding_sync_enabled=True))


def test_ldp_tiles():
    _check(128, 128, 3, "LDP",
           pps_kw=dict(tiles_enabled=True, num_tile_columns=2,
                       num_tile_rows=2))


def test_ldp_two_slices():
    _check(96, 64, 3, "LDP", num_slices=2)


def test_ldp_amp():
    _check(96, 64, 3, "LDP", sps_kw=dict(amp_enabled=True))


def test_ldp_cu_qp_delta():
    _check(96, 64, 3, "LDP",
           pps_kw=dict(cu_qp_delta_enabled=True, diff_cu_qp_delta_depth=1))


def test_skip_heavy_high_qp():
    _check(96, 64, 4, "LDP", qp=45)


def test_low_qp_dense_residual():
    _check(96, 64, 3, "LDP", qp=18)
