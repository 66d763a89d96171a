"""CABAC engine round-trip property tests (encoder output -> normative decoder)."""
import numpy as np

from p265_tpu.hls.bitio import BitReader, BitWriter
from p265_tpu.entropy.engine import CabacDecoder, CabacEncoder, ContextModels
from p265_tpu.tables import NUM_CTX


def _roundtrip(ops, init_type=0, qp=26):
    """ops: list of (kind, ctx_idx_or_None, bin) tuples; returns decoded bins."""
    w = BitWriter()
    enc = CabacEncoder(w, ContextModels(init_type, qp))
    for kind, idx, b in ops:
        if kind == "ctx":
            enc.encode_bin(idx, b)
        elif kind == "byp":
            enc.encode_bypass(b)
        else:
            enc.encode_terminate(b)
    enc.encode_terminate(1)
    w.rbsp_trailing_bits()
    data = w.get_bytes()

    r = BitReader(data)
    dec = CabacDecoder(r, ContextModels(init_type, qp))
    out = []
    for kind, idx, b in ops:
        if kind == "ctx":
            out.append(dec.decode_bin(idx))
        elif kind == "byp":
            out.append(dec.decode_bypass())
        else:
            out.append(dec.decode_terminate())
    assert dec.decode_terminate() == 1
    return out


def test_roundtrip_random_mixed():
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(1, 2000))
        ops = []
        for _ in range(n):
            kind = ["ctx", "byp", "term"][int(rng.integers(0, 3)) if rng.random() < 0.95 else 2]
            kind = "ctx" if rng.random() < 0.5 else ("byp" if rng.random() < 0.9 else "term")
            idx = int(rng.integers(0, NUM_CTX))
            b = int(rng.integers(0, 2))
            if kind == "term":
                b = 0  # only final terminate is 1
            ops.append((kind, idx, b))
        got = _roundtrip(ops, init_type=int(rng.integers(0, 3)), qp=int(rng.integers(0, 52)))
        want = [b for _, _, b in ops]
        assert got == want, f"trial {trial}"


def test_roundtrip_biased_sequences():
    # long runs of the same bin in one context exercise state saturation
    for bias in (0, 1):
        ops = [("ctx", 5, bias)] * 5000 + [("ctx", 5, 1 - bias)] * 3
        assert _roundtrip(ops) == [bias] * 5000 + [1 - bias] * 3


def test_roundtrip_all_bypass():
    rng = np.random.default_rng(7)
    bins = [int(b) for b in rng.integers(0, 2, size=4000)]
    ops = [("byp", None, b) for b in bins]
    assert _roundtrip(ops) == bins


def test_roundtrip_terminate_only():
    assert _roundtrip([]) == []


def test_eg_and_unary_binarizations():
    rng = np.random.default_rng(3)
    w = BitWriter()
    enc = CabacEncoder(w, ContextModels(0, 26))
    vals = [(int(rng.integers(0, 5)), int(rng.integers(0, 1000))) for _ in range(300)]
    for k, v in vals:
        enc.encode_eg_bypass(k, v)
    enc.encode_terminate(1)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    dec = CabacDecoder(r, ContextModels(0, 26))
    for k, v in vals:
        assert dec.decode_eg_bypass(k) == v
    assert dec.decode_terminate() == 1


def test_unary_ctx_roundtrip():
    rng = np.random.default_rng(9)
    cases = [(int(rng.integers(0, 5)), 4) for _ in range(200)]
    w = BitWriter()
    enc = CabacEncoder(w, ContextModels(1, 30))
    for v, cmax in cases:
        enc.encode_unary_ctx("split_cu_flag", [0, 1, 2], cmax, min(v, cmax))
    enc.encode_terminate(1)
    w.rbsp_trailing_bits()
    dec = CabacDecoder(BitReader(w.get_bytes()), ContextModels(1, 30))
    for v, cmax in cases:
        assert dec.decode_unary_ctx("split_cu_flag", [0, 1, 2], cmax) == min(v, cmax)


def test_ctx_snapshot_restore_wpp():
    """WPP-style: snapshot contexts mid-stream, restore into a fresh engine."""
    w = BitWriter()
    ctx = ContextModels(0, 26)
    enc = CabacEncoder(w, ctx)
    for i in range(100):
        enc.encode_bin(3, i & 1)
    snap = enc.save_ctx()
    enc.encode_terminate(1)
    w.rbsp_trailing_bits()

    # decode and verify the snapshot matches at the same point
    dctx = ContextModels(0, 26)
    dec = CabacDecoder(BitReader(w.get_bytes()), dctx)
    for i in range(100):
        assert dec.decode_bin(3) == (i & 1)
    assert dec.save_ctx() == snap
