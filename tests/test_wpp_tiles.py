"""Config 4: tiles + WPP round trips (entropy substreams, tile availability)."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.syntax.tiles import build_tile_info
from p265_tpu.testgen.encoder import (Encoder, IntraEncoder,
                                      make_moving_sequence, make_test_image)


def test_tile_geometry_uniform():
    sps = SPS(pic_width=416, pic_height=240)  # 7x4 CTBs
    pps = PPS(tiles_enabled=True, num_tile_columns=3, num_tile_rows=2)
    ti = build_tile_info(sps, pps)
    assert ti.col_widths == [2, 2, 3]  # ((i+1)*7)//3 diffs per spec 6.5.1
    assert ti.row_heights == [2, 2]
    assert len(ti.segments) == 6
    assert sorted(a for seg in ti.segments for a in seg) == list(range(28))
    assert ti.tile_id_at(0, 0) == 0 and ti.tile_id_at(6, 3) == 5


def test_wpp_intra_roundtrip():
    sps = SPS(pic_width=256, pic_height=128)
    pps = PPS(init_qp=31, sign_data_hiding=True,
              entropy_coding_sync_enabled=True)
    img = make_test_image(256, 128, 5)
    stream, plan, rec = IntraEncoder(sps, pps, qp=31, seed=5).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    assert len(g.plan.sh.entry_point_offsets) == 1  # 2 CTB rows
    for c in range(3):
        assert np.array_equal(g.prefilter[c], rec[c])


def test_tiles_intra_roundtrip():
    sps = SPS(pic_width=256, pic_height=128)
    pps = PPS(init_qp=31, sign_data_hiding=True, tiles_enabled=True,
              num_tile_columns=2, num_tile_rows=2)
    img = make_test_image(256, 128, 6)
    stream, plan, rec = IntraEncoder(sps, pps, qp=31, seed=6).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    assert len(g.plan.sh.entry_point_offsets) == 3
    for c in range(3):
        assert np.array_equal(g.prefilter[c], rec[c])


def test_wpp_p_frames_tpu():
    sps = SPS(pic_width=192, pic_height=128, temporal_mvp_enabled=True)
    pps = PPS(init_qp=33, sign_data_hiding=True,
              entropy_coding_sync_enabled=True)
    frames = make_moving_sequence(192, 128, 3, seed=12)
    stream, recons = Encoder(sps, pps, qp=33, seed=12).encode_sequence(frames)
    gold = GoldenDecoder().decode_stream(stream)
    for f in gold:
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[f.poc][c])
    tpu = TpuDecoder().decode_stream(stream)
    for t, g in zip(tpu, gold):
        for c in range(3):
            assert np.array_equal(t.planes[c], g.planes[c])


def test_tiles_p_no_crosstile_filter():
    sps = SPS(pic_width=192, pic_height=128, temporal_mvp_enabled=True)
    pps = PPS(init_qp=33, sign_data_hiding=True, tiles_enabled=True,
              num_tile_columns=2, num_tile_rows=2,
              loop_filter_across_tiles=False)
    frames = make_moving_sequence(192, 128, 3, seed=13)
    stream, recons = Encoder(sps, pps, qp=33, seed=13).encode_sequence(frames)
    gold = GoldenDecoder().decode_stream(stream)
    for f in gold:
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[f.poc][c])


def test_tiles_plus_wpp_intra():
    """Both tiles and entropy_coding_sync enabled (legal Main-profile combo,
    spec 7.4.7.1): substreams are the CTB rows within each tile; WPP context
    sync restores the row-above snapshot of the SAME tile."""
    sps = SPS(pic_width=256, pic_height=128)
    pps = PPS(init_qp=31, sign_data_hiding=True, tiles_enabled=True,
              num_tile_columns=2, num_tile_rows=1,
              entropy_coding_sync_enabled=True)
    img = make_test_image(256, 128, 8)
    stream, plan, rec = IntraEncoder(sps, pps, qp=31, seed=8).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    # 2 tiles x 2 CTB rows = 4 substreams -> 3 entry points
    assert len(g.plan.sh.entry_point_offsets) == 3
    for c in range(3):
        assert np.array_equal(g.prefilter[c], rec[c])
    t = TpuDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(np.asarray(t.planes[c]), g.planes[c])


def test_tiles_plus_wpp_p_frames():
    sps = SPS(pic_width=256, pic_height=192, temporal_mvp_enabled=True)
    pps = PPS(init_qp=33, sign_data_hiding=True, tiles_enabled=True,
              num_tile_columns=2, num_tile_rows=2,
              entropy_coding_sync_enabled=True)
    frames = make_moving_sequence(256, 192, 3, seed=15)
    stream, recons = Encoder(sps, pps, qp=33, seed=15).encode_sequence(frames)
    gold = GoldenDecoder().decode_stream(stream)
    assert len(gold) == 3
    for f in gold:
        for c in range(3):
            assert np.array_equal(f.planes[c], recons[f.poc][c])
    tpu = TpuDecoder().decode_stream(stream)
    for t, g in zip(tpu, gold):
        for c in range(3):
            assert np.array_equal(np.asarray(t.planes[c]), g.planes[c])


def test_wpp_parallel_rows_bit_exact(monkeypatch):
    """WPP row lanes on worker threads (2-CTU skew, shared wavefront grids)
    produce bit-identical output to the sequential parse -- intra and P
    pictures, filters on (VERDICT r4 ask #4 / SURVEY.md 7.5(a)-(b))."""
    from p265_tpu.syntax.ctu import CtuCoder

    sps = SPS(pic_width=256, pic_height=192, temporal_mvp_enabled=True)
    pps = PPS(init_qp=32, sign_data_hiding=True,
              entropy_coding_sync_enabled=True)
    frames = make_moving_sequence(256, 192, 3, seed=21)
    stream, _ = Encoder(sps, pps, qp=32, seed=21).encode_sequence(frames)

    monkeypatch.setenv("P265_TPU_PARSE_WORKERS", "1")
    seq = GoldenDecoder(use_native_parse=True).decode_stream(stream)

    monkeypatch.setenv("P265_TPU_PARSE_WORKERS", "3")
    used = []
    orig = CtuCoder._code_wpp_parallel
    monkeypatch.setattr(CtuCoder, "_code_wpp_parallel",
                        lambda self: used.append(1) or orig(self))
    par = GoldenDecoder(use_native_parse=True).decode_stream(stream)
    assert used, "WPP-parallel path did not engage"
    assert len(seq) == len(par) == 3
    for s, p in zip(seq, par):
        for c in range(3):
            assert np.array_equal(s.planes[c], p.planes[c]), (s.poc, c)


def test_wpp_parallel_stands_down_below_break_even(monkeypatch):
    """Below the measured break-even core count the lanes auto-disable
    (this 2-CPU host measured 0.61-0.66x): parse_workers()==1 and the
    parallel gates return False."""
    import p265_tpu.syntax.ctu as ctu_mod

    monkeypatch.delenv("P265_TPU_PARSE_WORKERS", raising=False)
    monkeypatch.setattr(ctu_mod.os, "cpu_count", lambda: 2) \
        if hasattr(ctu_mod, "os") else None
    import os as _os
    monkeypatch.setattr(_os, "cpu_count", lambda: 2)
    assert ctu_mod.parse_workers() == 1
    monkeypatch.setattr(_os, "cpu_count", lambda: 8)
    assert ctu_mod.parse_workers() == 8
    monkeypatch.setenv("P265_TPU_PARSE_WORKERS", "0")
    assert ctu_mod.parse_workers() == 0
