"""Pallas TPU kernel: MC reference-window fetch + separable interpolation.

The XLA formulations pay gather overhead per window element (advanced
indexing) or per window (vmap'd dynamic_slice): measured 26-39 ms per
bucket dispatch at 1080p sizes against a ~0.1 ms HBM floor
(profiling/probe_mc_gather.py).  Here each kernel program DMAs K aligned
covering tiles from the edge-padded reference stack in HBM into VMEM
scratch (async, K in flight), shifts each tile in-register to the exact
window origin (pltpu.roll with the sub-tile offsets -- Mosaic requires
DMA starts provably aligned to the (8, 128) tiling, so the host passes
PRE-DIVIDED tile indices and the kernel multiplies back), and runs the
exact int32 separable filter.

Spec 8.5.4 semantics are preserved exactly for windows whose overreach
fits the edge pad (the caller's mc_overreach gate, kernels/mc.py); the
caller over-pads bottom/right so the aligned covering tile never leaves
the array.  Bit-exact vs kernels/mc._mc_blocks (interpret-mode test on
CPU + the bench bit-exact gate on chip).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 16       # windows per kernel program
LANE = 256   # covering-tile lanes: 128-aligned start + window cols <= 128


def _rows_c(span: int) -> int:
    # covering-tile rows: 8-aligned start (up to 7 rows early) + span
    return ((span + 7 + 7) // 8) * 8


def extra_pad() -> tuple[int, int]:
    """(bottom, right) padding beyond the MC_PAD edge pad that the aligned
    covering tiles require."""
    return 16, LANE


def _kernel(iy8_ref, ix128_ref, oy_ref, ox_ref, ridx_ref, fh_ref, fv_ref,
            refs_ref, out_ref, win_ref, sem, *, block: int, taps: int):
    span = block + taps - 1
    rows = _rows_c(span)
    i = pl.program_id(0)
    dmas = []
    for k in range(K):
        b = i * K + k
        dma = pltpu.make_async_copy(
            refs_ref.at[ridx_ref[b], pl.ds(iy8_ref[b] * 8, rows),
                        pl.ds(ix128_ref[b] * 128, LANE)],
            win_ref.at[k], sem.at[k])
        dma.start()
        dmas.append(dma)
    for k in range(K):
        b = i * K + k
        dmas[k].wait()
        w = win_ref[k].astype(jnp.int32)        # [rows, LANE] (uint8 DMA)
        w = pltpu.roll(w, -oy_ref[b], axis=0)   # window origin -> (0, 0)
        w = pltpu.roll(w, -ox_ref[b], axis=1)
        tmp = jnp.zeros((span, block), jnp.int32)
        for t in range(taps):
            tmp = tmp + fh_ref[k, t] * w[:span, t:t + block]
        acc = jnp.zeros((block, block), jnp.int32)
        for t in range(taps):
            acc = acc + fv_ref[k, t] * tmp[t:t + block, :]
        out_ref[k] = acc >> 6


@functools.partial(jax.jit, static_argnames=("block", "taps", "interpret"))
def mc_blocks_pallas(refs_padded, iy, ix, ridx, fh, fv, block: int,
                     taps: int, interpret: bool = False):
    """14-bit MC intermediates for n blocks (n % K == 0).

    refs_padded: [R, Hp, Wp] uint8 edge-padded reference planes in HBM
    with extra_pad() beyond the MC_PAD border on bottom/right.
    iy/ix: [n] int32 window starts IN PADDED coordinates (non-negative).
    ridx: [n] int32.  fh/fv: [n, taps] int32 per-block filter taps.
    Returns [n, block, block] int32.
    """
    n = iy.shape[0]
    assert n % K == 0, (n, K)
    span = block + taps - 1
    iy8 = iy >> 3
    ix128 = ix >> 7
    oy = iy & 7
    ox = ix & 127
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,        # iy8, ix128, oy, ox, ridx
        grid=(n // K,),
        in_specs=[
            pl.BlockSpec((K, taps), lambda i, *_: (i, 0)),
            pl.BlockSpec((K, taps), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((K, block, block), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, _rows_c(span), LANE), jnp.uint8),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, block=block, taps=taps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, block, block), jnp.int32),
        interpret=interpret,
    )(iy8, ix128, oy, ox, ridx, fh, fv, refs_padded)
