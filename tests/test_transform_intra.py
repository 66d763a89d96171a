import numpy as np

from p265_tpu.golden import transform as gt
from p265_tpu.golden import intra as gi


def test_idct_dc_flat():
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        c = np.zeros((n, n), np.int32)
        c[0, 0] = 1024
        r = gt.inverse_transform(c, log2, is_dst=False)
        assert (r == r[0, 0]).all()


def test_transform_roundtrip_low_qp():
    rng = np.random.default_rng(0)
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        res = rng.integers(-100, 100, size=(n, n)).astype(np.int32)
        for is_dst in ([False, True] if log2 == 2 else [False]):
            c = gt.forward_transform(res, log2, is_dst)
            lv = gt.quantize(c, 4, log2)
            d = gt.dequant(lv, 4, log2)
            r = gt.inverse_transform(d, log2, is_dst)
            err = np.abs(r - res)
            assert err.mean() < 3.0 and err.max() <= 12, (log2, is_dst, err.max())


def test_transform_skip_roundtrip():
    rng = np.random.default_rng(1)
    res = rng.integers(-50, 50, size=(4, 4)).astype(np.int32)
    lv = gt.quantize_transform_skip(res, 4)
    d = gt.dequant(lv, 4, 2)
    r = gt.transform_skip_residual(d)
    assert np.abs(r - res).max() <= 4


def _refs_from(vals_left, vals_top, corner, n):
    left = np.full(2 * n + 1, 0, np.int32)
    top = np.full(2 * n + 1, 0, np.int32)
    left[0] = top[0] = corner
    left[1:] = vals_left
    top[1:] = vals_top
    return left, top


def test_intra_dc_flat():
    n = 8
    left, top = _refs_from([100] * 2 * n, [100] * 2 * n, 100, n)
    p = gi.predict(gi.INTRA_DC, left, top, n, c_idx=0)
    assert (p == 100).all()


def test_intra_mode26_copies_top():
    n = 8
    toprow = np.arange(1, 2 * n + 1, dtype=np.int32) * 3
    left, top = _refs_from([7] * (2 * n), toprow, 5, n)
    p = gi.predict(26, left, top, n, c_idx=1)  # chroma: no edge filter
    for y in range(n):
        assert (p[y] == toprow[:n]).all()


def test_intra_mode10_copies_left():
    n = 8
    leftcol = np.arange(1, 2 * n + 1, dtype=np.int32) * 2
    left, top = _refs_from(leftcol, [9] * (2 * n), 5, n)
    p = gi.predict(10, left, top, n, c_idx=1)
    for x in range(n):
        assert (p[:, x] == leftcol[:n]).all()


def test_intra_mode2_and_34_diagonals():
    n = 4
    rng = np.random.default_rng(2)
    left, top = _refs_from(rng.integers(0, 256, 2 * n), rng.integers(0, 256, 2 * n), 128, n)
    # mode 2: 45-degree from bottom-left: pred[x][y] = p[-1][x+y+1]
    p2 = gi.predict(2, left, top, n, c_idx=1)
    for y in range(n):
        for x in range(n):
            assert p2[y, x] == left[1 + x + y + 1], (x, y)
    # mode 34: pred[x][y] = p[x+y+1][-1]
    p34 = gi.predict(34, left, top, n, c_idx=1)
    for y in range(n):
        for x in range(n):
            assert p34[y, x] == top[1 + x + y + 1], (x, y)


def test_intra_planar_corners():
    n = 8
    rng = np.random.default_rng(3)
    lv = rng.integers(0, 256, 2 * n)
    tv = rng.integers(0, 256, 2 * n)
    left, top = _refs_from(lv, tv, 100, n)
    p = gi.predict(gi.INTRA_PLANAR, left, top, n, c_idx=0)
    # planar at (0,0): ((N-1)*L0 + T(N) + (N-1)*T0 + L(N) + N) >> (log2N+1)
    want = ((n - 1) * lv[0] + tv[n] + (n - 1) * tv[0] + lv[n] + n) >> 4
    assert p[0, 0] == want
    assert p.min() >= 0 and p.max() <= 255


def test_intra_all_modes_in_range():
    rng = np.random.default_rng(4)
    for n in (4, 8, 16, 32):
        left, top = _refs_from(rng.integers(0, 256, 2 * n),
                               rng.integers(0, 256, 2 * n), 128, n)
        for mode in range(35):
            fl, ft = gi.filter_references(left, top, n, mode, True)
            p = gi.predict(mode, fl, ft, n, c_idx=0)
            assert p.shape == (n, n)
            assert p.min() >= 0 and p.max() <= 255, (n, mode)


def test_gather_availability_substitution():
    pic = np.full((16, 16), 50, np.int32)
    pic[0:8, 0:8] = 90
    avail = np.zeros((4, 4), dtype=bool)
    # nothing decoded -> all refs 128
    left, top = gi.gather_references(pic, avail, 8, 8, 4)
    assert (left == 128).all() and (top == 128).all()
    # above block decoded only
    avail[1, 2] = True  # block at (8,4)
    left, top = gi.gather_references(pic, avail, 8, 8, 4)
    assert (top[1:5] == 50).all()  # real above samples at y=7? x=8..11,y=7
    assert (left[1:] == top[1]).all() or (left[1:] == 50).all()  # substituted


def test_mpm_derivation():
    assert gi.derive_mpm(None, None) == [0, 1, 26]
    assert gi.derive_mpm(1, 1) == [0, 1, 26]
    got = gi.derive_mpm(10, 10)
    assert got[0] == 10 and len(set(got)) == 3
    assert all(2 <= m <= 34 for m in got[1:])
    assert gi.derive_mpm(10, 26) == [10, 26, 0]
    assert gi.derive_mpm(0, 1) == [0, 1, 26]
