import numpy as np
import pytest

from p265_tpu.hls.bitio import BitReader, BitWriter
from p265_tpu.hls import nal


def test_bit_roundtrip():
    rng = np.random.default_rng(0)
    w = BitWriter()
    ops = []
    for _ in range(500):
        kind = rng.integers(0, 3)
        if kind == 0:
            n = int(rng.integers(1, 25))
            v = int(rng.integers(0, 1 << n))
            w.u(v, n)
            ops.append(("u", n, v))
        elif kind == 1:
            v = int(rng.integers(0, 10000))
            w.ue(v)
            ops.append(("ue", None, v))
        else:
            v = int(rng.integers(-5000, 5000))
            w.se(v)
            ops.append(("se", None, v))
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for kind, n, v in ops:
        if kind == "u":
            assert r.u(n) == v
        elif kind == "ue":
            assert r.ue() == v
        else:
            assert r.se() == v
    assert r.more_rbsp_data() is False


def test_ue_small_values():
    w = BitWriter()
    for v in range(10):
        w.ue(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    assert [r.ue() for _ in range(10)] == list(range(10))


def test_more_rbsp_data():
    w = BitWriter()
    w.u(0b101, 3)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    assert r.more_rbsp_data()
    r.u(3)
    assert not r.more_rbsp_data()


def test_emulation_roundtrip():
    cases = [
        b"\x00\x00\x00\x00",
        b"\x00\x00\x01\x02\x03",
        b"\x00\x00\x02",
        b"\x00\x00\x03\x04",
        b"\x01\x00\x00\x00\x00\x00\x01",
        bytes(range(256)) + b"\x00" * 10,
    ]
    for rbsp in cases:
        ebsp = nal.rbsp_to_ebsp(rbsp)
        # EBSP must not contain 00 00 0x with x <= 3
        for i in range(2, len(ebsp)):
            if ebsp[i - 2] == 0 and ebsp[i - 1] == 0:
                assert ebsp[i] >= 3, (rbsp, ebsp)  # 03 is the escape byte itself
        assert nal.ebsp_to_rbsp(ebsp) == rbsp


def test_emulation_random_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        # biased toward zeros to hit escape paths
        data = rng.choice([0, 0, 0, 1, 2, 3, 255], size=rng.integers(1, 200))
        rbsp = bytes(data.astype(np.uint8).tobytes())
        assert nal.ebsp_to_rbsp(nal.rbsp_to_ebsp(rbsp)) == rbsp


def test_nal_roundtrip():
    payloads = [b"\x42" * 5, b"\x00\x00\x00\x00\x99", b"\x7f"]
    stream = b"".join(
        nal.make_nal(t, p, temporal_id=0, long_start_code=(i == 0))
        for i, (t, p) in enumerate(zip([nal.NAL_VPS, nal.NAL_SPS, nal.NAL_IDR_W_RADL], payloads))
    )
    units = nal.split_nal_units(stream)
    assert [u.nal_type for u in units] == [nal.NAL_VPS, nal.NAL_SPS, nal.NAL_IDR_W_RADL]
    assert [u.rbsp for u in units] == payloads
    assert all(u.temporal_id == 0 and u.layer_id == 0 for u in units)


def test_nal_classifiers():
    assert nal.is_irap(nal.NAL_IDR_W_RADL)
    assert nal.is_irap(nal.NAL_CRA)
    assert not nal.is_irap(nal.NAL_TRAIL_R)
    assert nal.is_slice_nal(nal.NAL_TRAIL_N)
    assert not nal.is_slice_nal(nal.NAL_SPS)
    assert nal.is_reference_nal(nal.NAL_TRAIL_R)
    assert not nal.is_reference_nal(nal.NAL_TRAIL_N)
