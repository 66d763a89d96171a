"""CRA/BLA/RASL leading-picture semantics (spec 8.1.3, 8.3.1, 8.3.2).

Encodes an open-GOP splice stream (testgen structure "CRA-RASL"): IDR(0),
P(1), CRA(4), RASL(2) referencing the pre-CRA picture, RADL(3), trailing
P(5..).  Verifies:
  - full decode: every frame decodable, bit-exact, output in POC order;
  - decode starting at the CRA (stream splice): RASL discarded, RADL and
    trailing pictures decoded bit-exactly;
  - CRA rewritten to BLA_W_LP mid-stream: RASL discarded, prior pictures
    bumped, POC restarts from the BLA's own lsb;
  - EOS NAL before the CRA: next CRA gets NoRaslOutputFlag=1 -> RASL
    discarded even with the full stream present.
"""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls import nal
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence

W, H, QP, N = 96, 64, 30, 8


@pytest.fixture(scope="module")
def cra_stream():
    sps = SPS(pic_width=W, pic_height=H, num_reorder_pics=2,
              max_dec_pic_buffering=6)
    pps = PPS(init_qp=QP)
    frames = make_moving_sequence(W, H, N, seed=11)
    enc = Encoder(sps, pps, qp=QP, seed=7)
    stream, recons = enc.encode_sequence(frames, structure="CRA-RASL")
    return stream, recons


def _decode(data):
    dec = GoldenDecoder()
    return dec.decode_stream(data)


def test_full_decode_all_frames(cra_stream):
    stream, recons = cra_stream
    out = _decode(stream)
    assert [f.poc for f in out] == list(range(N))
    for f, r in zip(out, recons):
        for c in range(3):
            assert np.array_equal(f.planes[c], r[c]), f"poc {f.poc} plane {c}"


def _splice_from_cra(stream):
    units = nal.split_nal_units(stream)
    out = b""
    seen_cra = False
    for u in units:
        if u.nal_type in (nal.NAL_VPS, nal.NAL_SPS, nal.NAL_PPS):
            out += nal.make_nal(u.nal_type, u.rbsp)
        elif u.nal_type == nal.NAL_CRA:
            seen_cra = True
            out += nal.make_nal(u.nal_type, u.rbsp)
        elif seen_cra:
            out += nal.make_nal(u.nal_type, u.rbsp)
    return out


def test_splice_at_cra_discards_rasl(cra_stream):
    stream, recons = cra_stream
    out = _decode(_splice_from_cra(stream))
    # RASL(2) discarded; RADL(3) + CRA(4) + trailing decode
    assert [f.poc for f in out] == [3, 4, 5, 6, 7]
    for f in out:
        r = recons[f.poc]
        for c in range(3):
            assert np.array_equal(f.planes[c], r[c]), f"poc {f.poc} plane {c}"


def test_bla_rewrite_discards_rasl(cra_stream):
    stream, recons = cra_stream
    units = nal.split_nal_units(stream)
    out_stream = b"".join(
        nal.make_nal(nal.NAL_BLA_W_LP if u.nal_type == nal.NAL_CRA
                     else u.nal_type, u.rbsp)
        for u in units)
    out = _decode(out_stream)
    # prior pictures 0,1 output; RASL(2) discarded; RADL(3)+trailing decoded
    assert [f.poc for f in out] == [0, 1, 3, 4, 5, 6, 7]
    for f in out:
        r = recons[f.poc]
        for c in range(3):
            assert np.array_equal(f.planes[c], r[c]), f"poc {f.poc} plane {c}"


def test_eos_before_cra_discards_rasl(cra_stream):
    stream, recons = cra_stream
    units = nal.split_nal_units(stream)
    out_stream = b""
    for u in units:
        if u.nal_type == nal.NAL_CRA:
            out_stream += nal.make_nal(nal.NAL_EOS, b"")
        out_stream += nal.make_nal(u.nal_type, u.rbsp)
    out = _decode(out_stream)
    assert [f.poc for f in out] == [0, 1, 3, 4, 5, 6, 7]
    for f in out:
        r = recons[f.poc]
        for c in range(3):
            assert np.array_equal(f.planes[c], r[c]), f"poc {f.poc} plane {c}"


def test_mid_stream_cra_decodes_rasl(cra_stream):
    """A CRA encountered mid-decode (NoRaslOutputFlag=0) keeps its RASLs."""
    stream, recons = cra_stream
    out = _decode(stream)
    assert any(f.poc == 2 for f in out)  # the RASL picture was decoded
