"""Pallas TPU kernel: fused dequant + inverse transform for one size bucket.

One kernel program processes a block of TUs entirely in VMEM: staged-shift
exact dequant (elementwise, VPU), stage-1/stage-2 butterfly as 2-D matmuls on
the MXU via the int16->8-bit-limb bf16 trick (exact f32 accumulation), 16-bit
clamps between stages.  Avoids the HBM round trips the unfused XLA path pays
between dequant and the two matmul stages.

Bit-exact vs kernels/itransform.batch_residual (tested); used when
`use_pallas=True` (interpret mode on CPU backends for tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p265_tpu.tables import DCT, DST4, LEVEL_SCALE

BIT_DEPTH = 8
TN = 128  # TUs per kernel program


def _limb_matmul(a, m_bf):
    """Exact int matmul a[int32 in +-2^15] @ m via 8-bit limbs on the MXU."""
    a_hi = (a >> 8).astype(jnp.bfloat16)
    a_lo = (a & 0xFF).astype(jnp.bfloat16)
    hi = jax.lax.dot_general(a_hi, m_bf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    lo = jax.lax.dot_general(a_lo, m_bf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return (hi.astype(jnp.int32) << 8) + lo.astype(jnp.int32)


def _kernel(levels_ref, qp_ref, isdst_ref, tskip_ref, bypass_ref,
            dct_ref, dst_ref, out_ref, *, log2: int):
    s = 1 << log2
    bd = BIT_DEPTH + log2 - 5
    lv = levels_ref[:]                       # [TN*s, s] (TUs stacked row-wise)

    def per_row(a):  # [TN, 1] -> [TN*s, 1] (each TU scalar repeated s rows)
        return jnp.broadcast_to(a[:, None, :], (TN, s, 1)).reshape(TN * s, 1)

    qp_row = per_row(qp_ref[:])              # [TN*s, 1]
    e = qp_row // 6
    m6 = qp_row % 6
    # levelScale = {40,45,51,57,64,72}[qp%6] as a select cascade (no captured
    # constant arrays inside the pallas kernel)
    ls_row = jnp.where(m6 == 0, 40, jnp.where(m6 == 1, 45,
             jnp.where(m6 == 2, 51, jnp.where(m6 == 3, 57,
             jnp.where(m6 == 4, 64, 72)))))
    x = lv * (16 * ls_row)
    rsh = jnp.maximum(bd - e, 0)
    rnd = jnp.where(e < bd, 1 << jnp.maximum(bd - 1 - e, 0), 0)
    d = jnp.where(e > bd, x << jnp.maximum(e - bd, 0), (x + rnd) >> rsh)
    d = jnp.clip(d, -32768, 32767)           # [TN*s, s]

    dct = dct_ref[:].astype(jnp.bfloat16)
    # stage 1: per TU t = M^T @ d  computed as (d^T @ M)^T; with row-stacked
    # TUs we instead transpose each s x s block in registers
    d_blocks = d.reshape(TN, s, s)
    dT = jnp.swapaxes(d_blocks, 1, 2).reshape(TN * s, s)
    t = _limb_matmul(dT, dct)                # [(TN*s), s] = per-TU (d^T M)
    t = jnp.clip((t + 64) >> 7, -32768, 32767)
    # transpose back: rows of (M^T d)
    tT = jnp.swapaxes(t.reshape(TN, s, s), 1, 2).reshape(TN * s, s)
    r = _limb_matmul(tT, dct)                # per-TU (M^T d) @ M
    sh2 = 20 - BIT_DEPTH
    r = jnp.clip((r + (1 << (sh2 - 1))) >> sh2, -32768, 32767)

    if log2 == 2:
        dst = dst_ref[:].astype(jnp.bfloat16)
        t2 = _limb_matmul(dT, dst)
        t2 = jnp.clip((t2 + 64) >> 7, -32768, 32767)
        t2T = jnp.swapaxes(t2.reshape(TN, s, s), 1, 2).reshape(TN * s, s)
        r2 = _limb_matmul(t2T, dst)
        r2 = jnp.clip((r2 + (1 << (sh2 - 1))) >> sh2, -32768, 32767)
        isdst_row = per_row(isdst_ref[:])
        r = jnp.where(isdst_row > 0, r2, r)
        ts = jnp.clip((jnp.left_shift(d, 7) + (1 << (sh2 - 1))) >> sh2,
                      -32768, 32767)
        tskip_row = per_row(tskip_ref[:])
        r = jnp.where(tskip_row > 0, ts, r)
    byp_row = per_row(bypass_ref[:])
    out_ref[:] = jnp.where(byp_row > 0, lv, r)


@functools.partial(jax.jit, static_argnames=("log2", "interpret"))
def pallas_batch_residual(levels, qp, is_dst, tskip, bypass, log2: int,
                          interpret: bool = False):
    """[n, s, s] levels -> [n, s, s] residual; pallas fused kernel."""
    n = levels.shape[0]
    s = 1 << log2
    n_pad = ((n + TN - 1) // TN) * TN
    g = n_pad // TN
    lv = jnp.zeros((n_pad * s, s), jnp.int32)
    lv = lv.at[:n * s].set(levels.reshape(n * s, s))
    def pad1(a, dt=jnp.int32):
        out = jnp.zeros((n_pad, 1), dt)
        return out.at[:n, 0].set(a.astype(dt))
    qp_p = pad1(qp)
    dst_p = pad1(is_dst)
    ts_p = pad1(tskip)
    by_p = pad1(bypass)
    dct = jnp.asarray(np.asarray(DCT[s]), jnp.int32)
    dst_m = jnp.asarray(np.asarray(DST4 if s == 4 else DCT[s]), jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, log2=log2),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((TN * s, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN * s, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad * s, s), jnp.int32),
        interpret=interpret,
    )(lv, qp_p, dst_p, ts_p, by_p, dct, dst_m)
    return out[:n * s].reshape(n, s, s)
