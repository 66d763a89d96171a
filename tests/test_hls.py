"""SPS/PPS/slice-header write->parse round-trip tests."""
from p265_tpu.hls import nal
from p265_tpu.hls.bitio import BitReader, BitWriter
from p265_tpu.hls.params import (PPS, SPS, ShortTermRPS, parse_pps, parse_sps,
                                 write_pps, write_sps, write_vps)
from p265_tpu.hls.slice_header import (SLICE_B, SLICE_I, SLICE_P, SliceHeader,
                                       parse_slice_header, write_slice_header)


def _rt_sps(s: SPS) -> SPS:
    w = BitWriter()
    write_sps(w, s)
    return parse_sps(w.get_bytes())


def _rt_pps(p: PPS) -> PPS:
    w = BitWriter()
    write_pps(w, p)
    return parse_pps(w.get_bytes())


def test_sps_roundtrip_default():
    s = SPS()
    s2 = _rt_sps(s)
    for f in ("pic_width", "pic_height", "log2_ctb_size", "log2_min_cb_size",
              "log2_min_tb_size", "log2_max_tb_size", "sao_enabled",
              "amp_enabled", "temporal_mvp_enabled", "strong_intra_smoothing",
              "log2_max_poc_lsb", "max_dec_pic_buffering", "num_reorder_pics"):
        assert getattr(s2, f) == getattr(s, f), f


def test_sps_roundtrip_with_rps():
    s = SPS(pic_width=832, pic_height=480, temporal_mvp_enabled=True,
            num_reorder_pics=2)
    s.st_rps = [
        ShortTermRPS(delta_poc_s0=[-1], used_s0=[1]),
        ShortTermRPS(delta_poc_s0=[-1, -2], used_s0=[1, 1],
                     delta_poc_s1=[1], used_s1=[1]),
    ]
    s2 = _rt_sps(s)
    assert len(s2.st_rps) == 2
    assert s2.st_rps[0].delta_poc_s0 == [-1]
    assert s2.st_rps[1].delta_poc_s0 == [-1, -2]
    assert s2.st_rps[1].delta_poc_s1 == [1]
    assert s2.st_rps[1].used_s0 == [1, 1]


def test_sps_derived():
    s = SPS(pic_width=416, pic_height=240, log2_ctb_size=6)
    assert s.pic_width_ctbs == 7 and s.pic_height_ctbs == 4
    assert s.num_ctbs == 28


def test_pps_roundtrip():
    p = PPS(init_qp=30, sign_data_hiding=True, cu_qp_delta_enabled=True,
            diff_cu_qp_delta_depth=1, cb_qp_offset=2, cr_qp_offset=-2,
            transform_skip_enabled=True)
    p2 = _rt_pps(p)
    for f in ("init_qp", "sign_data_hiding", "cu_qp_delta_enabled",
              "diff_cu_qp_delta_depth", "cb_qp_offset", "cr_qp_offset",
              "transform_skip_enabled", "tiles_enabled"):
        assert getattr(p2, f) == getattr(p, f), f


def test_pps_tiles_roundtrip():
    p = PPS(tiles_enabled=True, num_tile_columns=3, num_tile_rows=2,
            uniform_spacing=False, tile_column_widths=[2, 2, 3],
            tile_row_heights=[2, 2], entropy_coding_sync_enabled=True)
    p2 = _rt_pps(p)
    assert p2.num_tile_columns == 3 and p2.num_tile_rows == 2
    assert not p2.uniform_spacing
    assert p2.tile_column_widths == [2, 2]  # last is derived
    assert p2.entropy_coding_sync_enabled


def test_vps_writes():
    w = BitWriter()
    write_vps(w)
    assert len(w.get_bytes()) > 10


def _rt_slice(h: SliceHeader, sps: SPS, pps: PPS):
    w = BitWriter()
    write_slice_header(w, h, sps, pps)
    # append a fake slice-data byte so byte_pos is interior
    w.u(0xAB, 8)
    data = w.get_bytes()
    h2, sps2, pps2, off = parse_slice_header(
        data, h.nal_type, {sps.sps_id: sps}, {pps.pps_id: pps})
    assert data[off] == 0xAB
    return h2


def test_slice_header_idr():
    sps, pps = SPS(), PPS()
    h = SliceHeader(slice_type=SLICE_I, slice_qp=30)
    h2 = _rt_slice(h, sps, pps)
    assert h2.slice_type == SLICE_I
    assert h2.slice_qp == 30
    assert h2.sao_luma and h2.sao_chroma


def test_slice_header_p():
    sps = SPS(temporal_mvp_enabled=True)
    sps.st_rps = [ShortTermRPS(delta_poc_s0=[-1], used_s0=[1])]
    pps = PPS(cabac_init_present=True)
    h = SliceHeader(nal_type=nal.NAL_TRAIL_R, slice_type=SLICE_P,
                    pic_order_cnt_lsb=5, slice_qp=28, temporal_mvp_enabled=True,
                    num_ref_idx_l0_active=1, cabac_init_flag=True,
                    five_minus_max_num_merge_cand=3)
    h2 = _rt_slice(h, sps, pps)
    assert h2.slice_type == SLICE_P
    assert h2.pic_order_cnt_lsb == 5
    assert h2.temporal_mvp_enabled
    assert h2.cabac_init_flag
    assert h2.max_num_merge_cand == 2
    assert h2.init_type() == 2


def test_slice_header_b_explicit_rps():
    sps = SPS()
    sps.st_rps = [ShortTermRPS(delta_poc_s0=[-2], used_s0=[1])]
    pps = PPS()
    rps = ShortTermRPS(delta_poc_s0=[-1], used_s0=[1],
                       delta_poc_s1=[1], used_s1=[1])
    h = SliceHeader(nal_type=nal.NAL_TRAIL_R, slice_type=SLICE_B,
                    pic_order_cnt_lsb=1, st_rps_explicit=rps, slice_qp=32,
                    num_ref_idx_l0_active=1, num_ref_idx_l1_active=1,
                    mvd_l1_zero=True)
    h2 = _rt_slice(h, sps, pps)
    assert h2.slice_type == SLICE_B
    assert h2.st_rps_explicit is not None
    assert h2.st_rps_explicit.delta_poc_s0 == [-1]
    assert h2.st_rps_explicit.delta_poc_s1 == [1]
    assert h2.mvd_l1_zero
    assert h2.init_type() == 2


def test_slice_header_entry_points():
    sps, pps = SPS(), PPS(entropy_coding_sync_enabled=True)
    h = SliceHeader(slice_type=SLICE_I, entry_point_offsets=[100, 228, 55])
    h2 = _rt_slice(h, sps, pps)
    assert h2.entry_point_offsets == [100, 228, 55]
