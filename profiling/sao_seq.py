"""Replicate the 1080p filter-chain compile sequence with synthetic data."""
import time

import numpy as np
import jax.numpy as jnp

from p265_tpu.kernels.loopfilter import (
    _deblock_chroma_vertical, _deblock_luma_vertical, _sao_apply)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


rng = np.random.default_rng(0)


def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    out.block_until_ready()
    log(name, round(time.perf_counter() - t0, 2))
    return out


def mk(h, w):
    return jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.int32))


y, cb = mk(1080, 1920), mk(540, 960)
bs = jnp.asarray(rng.integers(0, 3, (270, 239), dtype=np.int32))
t("dbl V", lambda: _deblock_luma_vertical(
    y, bs, jnp.full((270, 239), 64, jnp.int32),
    jnp.full((270, 239), 8, jnp.int32)))
t("dbc V", lambda: _deblock_chroma_vertical(
    cb, jnp.full((135, 119), 4, jnp.int32)))
bs_h = jnp.asarray(rng.integers(0, 3, (480, 134), dtype=np.int32))
t("dbl H", lambda: _deblock_luma_vertical(
    y.T, bs_h, jnp.full((480, 134), 64, jnp.int32),
    jnp.full((480, 134), 8, jnp.int32)).T)
t("dbc H", lambda: _deblock_chroma_vertical(
    cb.T, jnp.full((240, 67), 4, jnp.int32)).T)
ny, nx = 17, 30
ty = jnp.asarray(rng.integers(0, 3, (ny, nx), dtype=np.int32))
cls = jnp.asarray(rng.integers(0, 4, (ny, nx), dtype=np.int32))
offs = jnp.asarray(rng.integers(-3, 4, (4, ny, nx), dtype=np.int32))
t("sao luma", lambda: _sao_apply(y, ty, cls, offs, 64))
t("sao chroma", lambda: _sao_apply(cb, ty, cls, offs, 32))
log("DONE")
