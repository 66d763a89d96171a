"""Bit-exactness of the MXU matmul intra predictor vs the reference kernel.

predict_batch_mxu must reproduce kernels/intra.predict_batch exactly for
every mode/size/availability pattern (the matmul folds all spec rounding
constants into the matrix constant column; any floor-composition mistake
shows up here).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from p265_tpu.kernels.intra import predict_batch
from p265_tpu.kernels.intra_mxu import predict_batch_mxu, _a_table

PH, PW = 160, 192


def _mk_inputs(rng, s, n, all_ok=False):
    nref2 = 2 * (2 * s + 1)
    pos = np.stack([rng.integers(0, (PH - s) // 4, n) * 4,
                    rng.integers(0, (PW - s) // 4, n) * 4], 1).astype(np.int32)
    ref_ys = rng.integers(0, PH, (n, nref2)).astype(np.int32)
    ref_xs = rng.integers(0, PW, (n, nref2)).astype(np.int32)
    ok = (np.ones((n, nref2), bool) if all_ok
          else rng.integers(0, 2, (n, nref2)).astype(bool))
    residual = rng.integers(-64, 64, (n, s, s)).astype(np.int32)
    return pos, ref_ys, ref_xs, ok, residual


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_all_modes_bit_exact(size, c_idx):
    rng = np.random.default_rng(size * 7 + c_idx)
    plane = jnp.asarray(rng.integers(0, 256, (PH, PW)).astype(np.int32))
    n = 35
    pos, ys, xs, ok, res = _mk_inputs(rng, size, n)
    mode = np.arange(35, dtype=np.int32)
    ff = np.array([m not in (0, 1, 10, 26) and size != 4 and c_idx == 0
                   for m in mode])
    sa = (np.ones(n, bool) if size == 32 and c_idx == 0 else np.zeros(n, bool))
    args = [jnp.asarray(a) for a in (pos, ys, xs, ok, mode, ff, sa, res)]
    ref = predict_batch(plane, *args, size, c_idx)
    got = predict_batch_mxu(plane, *args, size, c_idx)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_random_batches(size):
    rng = np.random.default_rng(size)
    for trial in range(3):
        plane = jnp.asarray(rng.integers(0, 256, (PH, PW)).astype(np.int32))
        n = 16
        pos, ys, xs, ok, res = _mk_inputs(rng, size, n,
                                          all_ok=(trial == 2))
        mode = rng.integers(0, 35, n).astype(np.int32)
        ff = np.array([m not in (0, 1, 10, 26) for m in mode]) & (size > 4)
        sa = rng.integers(0, 2, n).astype(bool) & (size == 32)
        inter = rng.integers(0, 2, n).astype(bool)
        predp = jnp.asarray(rng.integers(0, 256, (PH, PW)).astype(np.int32))
        args = [jnp.asarray(a) for a in (pos, ys, xs, ok, mode, ff, sa, res)]
        ref = predict_batch(plane, *args, size, 0,
                            inter=jnp.asarray(inter), pred_plane=predp)
        got = predict_batch_mxu(plane, *args, size, 0,
                                inter=jnp.asarray(inter), pred_plane=predp)
        assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_table_bounds():
    for s in (4, 8, 16, 32):
        A = _a_table(s)
        assert A.min() >= 0 and A.max() <= 128
        assert A.sum(axis=2).max() <= 96
