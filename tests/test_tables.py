"""Invariant tests for p265_tpu.tables (SURVEY.md Appendix A + section 7.7)."""
import numpy as np

from p265_tpu import tables as T


def test_dct4_exact():
    expected = np.array(
        [[64, 64, 64, 64],
         [83, 36, -36, -83],
         [64, -64, -64, 64],
         [36, -83, 83, -36]], dtype=np.int32)
    assert (T.DCT4 == expected).all()


def test_dct8_rows():
    # canonical odd rows of the 8-pt transform
    assert list(T.DCT8[1]) == [89, 75, 50, 18, -18, -50, -75, -89]
    assert list(T.DCT8[3]) == [75, -18, -89, -50, 50, 89, 18, -75]
    assert list(T.DCT8[5]) == [50, -89, 18, 75, -75, -18, 89, -50]
    assert list(T.DCT8[7]) == [18, -50, 75, -89, 89, -75, 50, -18]
    # even rows subsample DCT4 with symmetry
    assert list(T.DCT8[2]) == [83, 36, -36, -83, -83, -36, 36, 83]


def test_dct_near_orthogonal():
    for n, m in T.DCT.items():
        g = m.astype(np.int64) @ m.astype(np.int64).T
        norm = 64 * 64 * n
        diag = np.diag(g)
        assert np.all(np.abs(diag - norm) <= 0.004 * norm), (n, diag)
        off = g - np.diag(diag)
        assert np.max(np.abs(off)) <= 0.004 * norm, (n, np.max(np.abs(off)))


def test_dct32_first_odd_row():
    assert list(T.DCT32[1][:16]) == [90, 90, 88, 85, 82, 78, 73, 67,
                                     61, 54, 46, 38, 31, 22, 13, 4]
    # odd symmetry
    assert list(T.DCT32[1][16:]) == [-4, -13, -22, -31, -38, -46, -54, -61,
                                     -67, -73, -78, -82, -85, -88, -90, -90]


def test_dst4_matches_spec():
    assert list(T.DST4[0]) == [29, 55, 74, 84]
    assert list(T.DST4[1]) == [74, 74, 0, -74]
    g = T.DST4.astype(np.int64) @ T.DST4.astype(np.int64).T
    assert np.all(np.abs(np.diag(g) - 16384) < 64)


def test_filters_unity_gain():
    assert (T.LUMA_FILTER.sum(axis=1) == 64).all()
    assert (T.CHROMA_FILTER.sum(axis=1) == 64).all()


def test_range_tab_lps_spot():
    assert T.RANGE_TAB_LPS[0][0] == 128
    assert list(T.RANGE_TAB_LPS[63]) == [2, 2, 2, 2]
    # monotone decay down columns (except final quirk row)
    col = T.RANGE_TAB_LPS[:63, 0]
    assert np.all(np.diff(col) <= 0)


def test_ctx_init_equiprobable():
    for qp in (0, 26, 51):
        assert T.ctx_init_state(154, qp) == (0, 1)


def test_level_scale():
    assert list(T.LEVEL_SCALE) == [40, 45, 51, 57, 64, 72]
    # geometric ladder ~ 40 * 2^(i/6)
    for i, v in enumerate(T.LEVEL_SCALE):
        assert abs(v - 40 * 2 ** (i / 6)) < 1.2


def test_beta_tc_tables():
    assert T.BETA_TABLE[16] == 6 and T.BETA_TABLE[27] == 17
    assert T.BETA_TABLE[28] == 18 and T.BETA_TABLE[51] == 64
    assert T.TC_TABLE[17] == 0 and T.TC_TABLE[18] == 1
    assert T.TC_TABLE[53] == 24 and T.TC_TABLE[47] == 13


def test_chroma_qp():
    assert T.chroma_qp_from_luma(29) == 29
    assert T.chroma_qp_from_luma(30) == 29
    assert T.chroma_qp_from_luma(43) == 37
    assert T.chroma_qp_from_luma(44) == 38
    assert T.chroma_qp_from_luma(51) == 45


def test_diag_scan_4():
    s = T.diag_scan(4)
    assert list(map(tuple, s[:6])) == [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0)]
    assert len(s) == 16
    assert len({tuple(p) for p in s}) == 16


def test_scans_complete():
    for blk in (2, 4, 8):
        for idx in range(3):
            s = T.scan_order(idx, blk)
            assert len({tuple(p) for p in s}) == blk * blk


def test_ctx_count():
    # 42 sig + 24 gt1 + 6 gt2 + 2*18 last + 4 csbf etc.
    assert len(T.CTX_INIT["sig_coeff_flag"][0]) == 42
    assert len(T.CTX_INIT["coeff_abs_level_greater1_flag"][0]) == 24
    assert len(T.CTX_INIT["coeff_abs_level_greater2_flag"][0]) == 6
    arr = T.init_context_array(0, 26)
    assert arr.shape == (T.NUM_CTX, 2)
    assert (arr[:, 0] >= 0).all() and (arr[:, 0] <= 62).all()


def test_last_sig_prefix_ctx():
    # luma 4x4: ctx 0..2; 32x32: 10..14; chroma always 15..17
    assert T.last_sig_prefix_ctx(2, 0, 0) == 0
    assert T.last_sig_prefix_ctx(2, 0, 2) == 2
    assert T.last_sig_prefix_ctx(5, 0, 0) == 10
    assert T.last_sig_prefix_ctx(5, 0, 8) == 14
    assert T.last_sig_prefix_ctx(2, 1, 0) == 15
    assert T.last_sig_prefix_ctx(3, 1, 4) == 17
