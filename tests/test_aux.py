"""Auxiliary subsystems (SURVEY.md 5): error resilience, checkpoint/resume,
metrics, YUV IO, CLI."""
import json
import os

import numpy as np
import pytest

from p265_tpu import yuv
from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls import nal
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence


def _two_gop_stream(w=96, h=64, qp=33, seed=8):
    """IDR P P | IDR P P : two CVSs so resync-at-IRAP is observable."""
    sps = SPS(pic_width=w, pic_height=h, temporal_mvp_enabled=True)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    frames = make_moving_sequence(w, h, 6, seed=seed)
    enc = Encoder(sps, pps, qp=qp, seed=seed)
    s1, r1 = enc.encode_sequence(frames[:3], structure="LDP")
    enc2 = Encoder(sps, pps, qp=qp, seed=seed + 1)
    s2, r2 = enc2.encode_sequence(frames[3:], structure="LDP")
    # second stream: drop its parameter-set NALs (same ids) to form one CVS
    units = nal.split_nal_units(s2)
    tail = b"".join(nal.make_nal(u.nal_type, u.rbsp) for u in units
                    if nal.is_slice_nal(u.nal_type))
    return s1 + tail, r1 + r2


def test_error_resilience_resync_at_irap():
    stream, recons = _two_gop_stream()
    units = nal.split_nal_units(stream)
    slice_idx = [i for i, u in enumerate(units) if nal.is_slice_nal(u.nal_type)]
    # corrupt the 2nd slice (P frame of first GOP): truncate its payload so
    # the CABAC engine starves deterministically
    bad_units = []
    for i, u in enumerate(units):
        rbsp = u.rbsp
        if i == slice_idx[1]:
            rbsp = rbsp[:max(8, len(rbsp) // 3)]
        bad_units.append(nal.make_nal(u.nal_type, rbsp))
    bad = b"".join(bad_units)

    dec = GoldenDecoder(error_resilient=True)
    frames = dec.decode_stream(bad)
    assert dec.errors, "corruption should be detected"
    # everything from the second IDR decodes bit-exactly
    pocs_after = [f for f in frames if f is not None]
    tail = frames[-3:]
    for i, f in enumerate(tail):
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[3 + i][c]), (i, c)


def test_checkpoint_resume_bit_exact():
    stream, recons = _two_gop_stream(seed=9)
    units = nal.split_nal_units(stream)

    full = GoldenDecoder().decode_stream(stream)

    d1 = GoldenDecoder()
    half = len(units) // 2
    for u in units[:half]:
        d1.decode_nal(u)
    state = d1.save_state()

    d2 = GoldenDecoder()
    d2.load_state(state)
    for u in units[half:]:
        d2.decode_nal(u)
    resumed = d2.flush()
    # resumed decoder's frames must equal the tail of the full decode
    full_by_key = {(i, f.poc): f for i, f in enumerate(full)}
    assert len(resumed) >= 1
    full_tail = full[len(full) - len(resumed):]
    for f_r, f_f in zip(resumed, full_tail):
        for c in range(3):
            assert np.array_equal(f_r.planes[c], f_f.planes[c])


def test_yuv_roundtrip(tmp_path):
    frames = make_moving_sequence(32, 32, 3, seed=1)
    p = str(tmp_path / "t.yuv")
    yuv.write_yuv(p, frames)
    back = yuv.read_yuv(p, 32, 32)
    assert len(back) == 3
    for a, b in zip(frames, back):
        for c in range(3):
            assert np.array_equal(a[c], b[c])
    assert yuv.sequence_md5(frames) == yuv.sequence_md5(back)


def test_metrics_jsonl(tmp_path):
    stream, recons = _two_gop_stream(seed=10)
    dec = GoldenDecoder()
    dec.decode_stream(stream)
    p = str(tmp_path / "m.jsonl")
    dec.write_metrics(p)
    rec = json.loads(open(p).read().strip())
    assert rec["frames"] == 6
    assert rec["parse_s"] > 0 and rec["tus"] > 0


def test_cli_encode_decode(tmp_path):
    from p265_tpu.cli import main
    bit = str(tmp_path / "t.265")
    out = str(tmp_path / "t.yuv")
    assert main(["encode", "-i", "synthetic", "-o", bit, "--size", "64x64",
                 "--qp", "34", "--gop", "LDP", "--frames", "3"]) == 0
    assert main(["decode", "-i", bit, "-o", out, "--backend", "golden",
                 "--md5"]) == 0
    assert os.path.getsize(out) == 64 * 64 * 3 // 2 * 3
