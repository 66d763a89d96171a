"""Whole-wavefront Pallas kernel: the full intra reconstruction scan of a
merged frame batch in ONE pallas_call, with the picture plane resident in
VMEM across all wavefront steps.

Motivation (measured): the XLA lax.scan wavefront costs ~470us per step at
416x240 batch=4 shapes -- ~30-40 small HLO ops per step, each with a fixed
per-op cost, dominate.  Here one grid step = one wavefront step, everything
stays in VMEM/registers, and the sequential dependency (intra prediction
reads reconstructed neighbors) is carried by two VMEM scratch buffers:

  plane  [PH, 512]  int32 -- the merged picture (segments stacked), y-major:
                             top-row references are single-row dynamic loads.
  planeT [TR, TL]   int32 -- per-segment transposed copy, x-major: left-column
                             references become single-row dynamic loads too.

Per step, per size bucket (4/8/16/32):
  1. per-lane loop: load the raw reference row+column (roll to lane 0),
     park them in scratch rows;
  2. batched: availability substitution (spec 8.4.4.2.2) as a forward+
     backward masked fill over the scan-ordered reference vector (flips via
     one-hot antidiagonal matmuls on the MXU -- exact for 8-bit samples);
  3. batched: [1 2 1] / strong smoothing (vector ops, per-lane flags);
  4. batched: all 35 intra modes as ONE batched MXU matmul against the
     per-size prediction tables of kernels/intra_mxu (batch dim = mode),
     then a one-hot select by per-lane mode.  The 32x32 table (9.4 MB)
     stays in HBM; its rows are DMA'd per lane (cap is small);
  5. batched: DC/vertical/horizontal edge patches as iota-masked selects
     in flat lane space;
  6. per-lane loop: residual add + clip, then read-modify-write blends of
     the [s, s] tile into plane and (transposed) planeT.

Bit-exactness vs kernels/intra.predict_batch (and the golden decoder) is
enforced by tests/test_pallas_wavefront.py.  Integer arithmetic throughout;
all matmuls are bf16xbf16->f32 over values <= 255 with one-hot or bounded
(sum <= 96) weights, exact in f32.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p265_tpu.kernels.intra_mxu import _a_table

PW = 512          # merged plane width (lanes), fixed
REFW = 128        # per-lane raw reference row width (covers 2s+1 <= 65)
A32_RP = 136      # padded v-length for the 32x32 DMA'd tables


@functools.lru_cache()
def _a_bf16_t(size: int) -> np.ndarray:
    """[35, Rp, s*s] bf16 tables (transposed _a_table, rows padded)."""
    import ml_dtypes
    A = _a_table(size)                        # [35, s*s, 4s+3] int16
    R = A.shape[2]
    Rp = A32_RP if size == 32 else 128
    At = np.zeros((35, Rp, size * size), np.float32)
    At[:, :R, :] = A.transpose(0, 2, 1)
    return At.astype(ml_dtypes.bfloat16)


def _bucket_block(bref, plane, planeT, refs_l, refs_t, vb, tiles, pred32,
                  a32_scr, a32_sem, s: int, tl: int):
    """One size bucket of one wavefront step.  bref holds the per-step refs:
    (pos, okc, mode, ff, sa, edge, res, count, a_ref)."""
    (pos_ref, okc_ref, mode_ref, ff_ref, sa_ref, edge_ref, res_ref,
     cnt_ref, a_ref) = bref
    cap = okc_ref.shape[1]
    n2 = 2 * s
    nref = n2 + 1
    ss = s * s
    shift = 6 if s == 32 else 5
    okp = okc_ref.shape[2]

    count = cnt_ref[0, 0, 0]

    @pl.when(count > 0)
    def _():
        # -- 1. per-lane raw reference loads ---------------------------------
        def load_body(i, _):
            y = pos_ref[0, i, 0]
            x = pos_ref[0, i, 1]
            tb = pos_ref[0, i, 2]
            yl = pos_ref[0, i, 3]
            trow = plane[pl.ds(jnp.maximum(y - 1, 0), 1), :]
            trow = pltpu.roll(trow, -(x - 1), 1)
            refs_t[pl.ds(i, 1), :] = trow[:, :REFW]
            lrow = planeT[pl.ds(jnp.maximum(tb + x - 1, 0), 1), :]
            lrow = pltpu.roll(lrow, -(yl - 1), 1)
            refs_l[pl.ds(i, 1), :] = lrow[:, :REFW]
            return 0
        jax.lax.fori_loop(0, count, load_body, 0)

        raw_l = refs_l[:cap, :]               # [cap, REFW] corner-first down
        raw_t = refs_t[:cap, :]               # [cap, REFW] corner-first right

        # -- 2. substitution fill over the scan-ordered vector ---------------
        # c[0..2s] = reversed left (bottom-left first), c[2s+t] = top[t]
        lane_ok = jax.lax.broadcasted_iota(jnp.int32, (cap, okp), 1)
        fj = jax.lax.broadcasted_iota(jnp.int32, (REFW, okp), 0)
        fl = jax.lax.broadcasted_iota(jnp.int32, (REFW, okp), 1)
        F = ((fj + fl == n2) & (fj <= n2)).astype(jnp.bfloat16)
        cL = jax.lax.dot_general(
            raw_l.astype(jnp.bfloat16), F, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        topr = pltpu.roll(jnp.pad(raw_t, ((0, 0), (0, okp - REFW))), n2, 1)
        c = jnp.where(lane_ok <= n2, cL,
                      jnp.where(lane_ok <= 4 * s, topr, 0))
        ok = okc_ref[0].astype(jnp.int32)      # [cap, okp] scan-ordered
        any_ok = jnp.max(ok, axis=1, keepdims=True)
        sh = 1
        while sh < okp:                        # forward fill (earlier scan)
            rv = pltpu.roll(c, sh, 1)
            rk = pltpu.roll(ok, sh, 1) * (lane_ok >= sh)
            c = jnp.where((ok == 0) & (rk != 0), rv, c)
            ok = ok | rk
            sh <<= 1
        sh = 1
        while sh < okp:                        # backward fill (prefix)
            rv = pltpu.roll(c, okp - sh, 1)
            rk = pltpu.roll(ok, okp - sh, 1) * (lane_ok < okp - sh)
            c = jnp.where((ok == 0) & (rk != 0), rv, c)
            ok = ok | rk
            sh <<= 1
        c = jnp.where(any_ok != 0, c, 128)
        cf = jax.lax.dot_general(                     # un-flip -> left
            c[:, :REFW].astype(jnp.bfloat16), F[:, :REFW],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        left = cf                                     # [cap, REFW] corner@0
        top = pltpu.roll(c, okp - n2, 1)[:, :REFW]         # corner@0

        # -- 3. reference smoothing ([1 2 1] / strong) -----------------------
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, REFW), 1)
        ff = ff_ref[0] != 0                           # [cap, 1]
        lm1, lp1 = pltpu.roll(left, 1, 1), pltpu.roll(left, REFW - 1, 1)
        tm1, tp1 = pltpu.roll(top, 1, 1), pltpu.roll(top, REFW - 1, 1)
        corner = (lp1 + 2 * left + tp1 + 2) >> 2      # valid at lane 0
        fl_ = (lm1 + 2 * left + lp1 + 2) >> 2
        ft_ = (tm1 + 2 * top + tp1 + 2) >> 2
        fl_ = jnp.where(lane == 0, corner, jnp.where(lane < n2, fl_, left))
        ft_ = jnp.where(lane == 0, corner, jnp.where(lane < n2, ft_, top))
        if s == 32:
            sa = sa_ref[0] != 0
            l0, l2n = left[:, 0:1], left[:, n2:n2 + 1]
            t0, t2n = top[:, 0:1], top[:, n2:n2 + 1]
            thresh = 1 << 3
            flat = ((jnp.abs(t0 + t2n - 2 * top[:, s:s + 1]) < thresh)
                    & (jnp.abs(l0 + l2n - 2 * left[:, s:s + 1]) < thresh))
            strong = sa & flat
            sl = ((n2 - lane) * l0 + lane * l2n + s) >> 6
            st = ((n2 - lane) * t0 + lane * t2n + s) >> 6
            sl = jnp.where(lane == 0, l0, jnp.where(lane == n2, l2n, sl))
            st = jnp.where(lane == 0, t0, jnp.where(lane == n2, t2n, st))
            fl_ = jnp.where(strong, sl, fl_)
            ft_ = jnp.where(strong, st, ft_)
        left_f = jnp.where(ff, fl_, left)
        top_f = jnp.where(ff, ft_, top)

        # -- 4. prediction: batched 35-mode MXU matmul -----------------------
        rp = A32_RP if s == 32 else 128
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (cap, rp), 1)
        lf_p = jnp.pad(left_f, ((0, 0), (0, rp - REFW)))
        tf_p = jnp.pad(top_f, ((0, 0), (0, rp - REFW)))
        v = jnp.where(lane_r <= n2, lf_p,
                      jnp.where(lane_r <= 2 * n2 + 1,
                                pltpu.roll(tf_p, nref, 1),
                                jnp.where(lane_r == 2 * n2 + 2, 1, 0)))
        mode = mode_ref[0]                             # [cap, 1]
        if s == 32:
            # per-lane DMA of the A32[mode] table row + matvec
            vb[:cap, :] = v
            def dma_body(i, _):
                m = mode_ref[0, i, 0]
                dma = pltpu.make_async_copy(a_ref.at[m], a32_scr, a32_sem)
                dma.start()
                dma.wait()
                vi = vb[pl.ds(i, 1), :]
                acc = jax.lax.dot_general(
                    vi.astype(jnp.bfloat16), a32_scr[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pred32[pl.ds(i, 1), :] = acc.astype(jnp.int32) >> shift
                return 0
            jax.lax.fori_loop(0, count, dma_body, 0)
            pred = pred32[:cap, :]
        else:
            lhs = jnp.broadcast_to(v.astype(jnp.bfloat16)[None],
                                   (35, cap, rp))
            P = jax.lax.dot_general(
                lhs, a_ref[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # [35, cap, ss]
            sel = (jax.lax.broadcasted_iota(jnp.int32, (35, cap, 1), 0)
                   == mode[None])
            pred = (jnp.sum(jnp.where(sel, P, 0.0), axis=0)
                    .astype(jnp.int32) >> shift)       # [cap, ss]

        # -- 5. DC / mode-26 / mode-10 edge patches --------------------------
        if s < 32:
            L = jax.lax.broadcasted_iota(jnp.int32, (cap, ss), 1)
            edge = edge_ref[0] != 0                    # [cap, 1] luma gate
            dc = pred[:, s + 1:s + 2]
            is_dc = (mode == 1) & edge
            rowv = (pltpu.roll(top_f, REFW - 1, 1) + 3 * dc + 2) >> 2
            colv = (pltpu.roll(left_f, REFW - 1, 1) + 3 * dc + 2) >> 2
            cv = (left_f[:, 1:2] + 2 * dc + top_f[:, 1:2] + 2) >> 2
            sr = jax.lax.broadcasted_iota(jnp.int32, (REFW, ss), 0)
            sc = jax.lax.broadcasted_iota(jnp.int32, (REFW, ss), 1)
            SP = ((sc == sr * s) & (sr < s)).astype(jnp.bfloat16)
            col_sp = jax.lax.dot_general(               # lane j*s <- vals[j]
                colv.astype(jnp.bfloat16), SP, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            row_in = jnp.pad(rowv[:, :s], ((0, 0), (0, ss - s))) \
                if ss > s else rowv[:, :s]
            pred = jnp.where(is_dc & (L < s) & (L >= 1), row_in, pred)
            pred = jnp.where(is_dc & (L % s == 0) & (L >= s), col_sp, pred)
            pred = jnp.where(is_dc & (L == 0), cv, pred)
            vcol = jnp.clip(top_f[:, 1:2]
                            + ((pltpu.roll(left_f, REFW - 1, 1)
                                - left_f[:, 0:1]) >> 1), 0, 255)
            vcol_sp = jax.lax.dot_general(
                vcol.astype(jnp.bfloat16), SP, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            hrow = jnp.clip(left_f[:, 1:2]
                            + ((pltpu.roll(top_f, REFW - 1, 1)
                                - top_f[:, 0:1]) >> 1), 0, 255)
            hrow_in = jnp.pad(hrow[:, :s], ((0, 0), (0, ss - s))) \
                if ss > s else hrow[:, :s]
            pred = jnp.where((mode == 26) & edge & (L % s == 0),
                             vcol_sp, pred)
            pred = jnp.where((mode == 10) & edge & (L < s), hrow_in, pred)

        # -- 6. residual add + clip, regroup, per-lane RMW stores ------------
        out = jnp.clip(pred + res_ref[0], 0, 255)
        for r in range(s):
            tiles[r:cap * s:s, :s] = out[:, r * s:(r + 1) * s]

        lane_p = jax.lax.broadcasted_iota(jnp.int32, (s + 8, PW), 1)
        row_p = jax.lax.broadcasted_iota(jnp.int32, (s + 8, PW), 0)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (s + 8, tl), 1)

        def store_body(i, _):
            y = pos_ref[0, i, 0]
            x = pos_ref[0, i, 1]
            tb = pos_ref[0, i, 2]
            yl = pos_ref[0, i, 3]
            tile = tiles[pl.ds(i * s, s), :s]
            # plane RMW: rows [ybase, ybase+s+8), lanes [x, x+s)
            dy = y & 7
            ybase = pl.multiple_of(y - dy, 8)
            w = plane[pl.ds(ybase, s + 8), :]
            t0 = jnp.pad(tile, ((0, 8), (0, PW - s)))
            t4 = jnp.pad(tile, ((4, 4), (0, PW - s)))
            tp = jnp.where(dy == 0, t0, t4)
            tp = pltpu.roll(tp, x, 1)
            m = ((row_p >= dy) & (row_p < dy + s)
                 & (lane_p >= x) & (lane_p < x + s))
            plane[pl.ds(ybase, s + 8), :] = jnp.where(m, tp, w)
            # planeT RMW: rows [tb+x, ...), lanes [yl, yl+s)
            tt = tile.T
            dx = x & 7
            xbase = pl.multiple_of(tb + x - dx, 8)
            wt = planeT[pl.ds(xbase, s + 8), :]
            u0 = jnp.pad(tt, ((0, 8), (0, tl - s)))
            u4 = jnp.pad(tt, ((4, 4), (0, tl - s)))
            up = jnp.where(dx == 0, u0, u4)
            up = pltpu.roll(up, yl, 1)
            mt = ((row_p[:, :tl] >= dx) & (row_p[:, :tl] < dx + s)
                  & (lane_q >= yl) & (lane_q < yl + s))
            planeT[pl.ds(xbase, s + 8), :] = jnp.where(mt, up, wt)
            return 0
        jax.lax.fori_loop(0, count, store_body, 0)


def _make_kernel(sizes, tl: int, n_steps: int):
    nsz = len(sizes)

    def kernel(*refs):
        # refs: per bucket 8 streamed + 1 table, then out, then scratches
        step = pl.program_id(0)
        ins = refs[:nsz * 9]
        out_ref = refs[nsz * 9]
        (plane, planeT, refs_l, refs_t, vb, tiles, pred32, a32_scr,
         a32_sem, out_sem) = refs[nsz * 9 + 1:]

        @pl.when(step == 0)
        def _():
            plane[:] = jnp.zeros_like(plane)
            planeT[:] = jnp.zeros_like(planeT)

        for bi, log2 in enumerate(sizes):
            s = 1 << log2
            bref = ins[bi * 9:(bi + 1) * 9]
            _bucket_block(bref, plane, planeT, refs_l, refs_t, vb,
                          tiles, pred32, a32_scr, a32_sem, s, tl)

        @pl.when(step == n_steps - 1)
        def _():
            dma = pltpu.make_async_copy(plane, out_ref, out_sem)
            dma.start()
            dma.wait()

    return kernel


def scan_plane_pallas(stacked, sizes, shape, tr: int, tl: int,
                      interpret: bool = False):
    """Run the whole wavefront scan in one pallas_call.

    stacked: {log2: dict} with [n_steps, ...] device arrays: pos4, okc,
    mode, filter_flag, strong_allowed, dc_edge, residual [n_steps,cap,s,s],
    counts [n_steps].  tr/tl: planeT scratch geometry (static, from
    wavefront.planeT_geometry).  Returns the plane [ph, pw] int32.
    """
    ph, pw = shape
    assert pw <= PW
    sizes = tuple(sizes)
    d0 = stacked[sizes[0]]
    n_steps = d0["pos4"].shape[0]
    php = ((ph + 15) // 8) * 8  # bottom slack for the RMW windows

    operands = []
    in_specs = []
    grid = (n_steps,)
    caps, okps = [], []
    for log2 in sizes:
        d = stacked[log2]
        s = 1 << log2
        cap = d["okc"].shape[1]
        okp = d["okc"].shape[2]
        caps.append(cap)
        okps.append(okp)
        res = d["residual"].reshape(n_steps, cap, s * s)
        per_step = [
            (d["pos4"], pltpu.SMEM, (1, cap, 4)),
            (d["okc"], pltpu.VMEM, (1, cap, okp)),
            (d["mode"].reshape(n_steps, cap, 1), pltpu.VMEM, (1, cap, 1)),
            (d["filter_flag"].astype(jnp.int32).reshape(n_steps, cap, 1),
             pltpu.VMEM, (1, cap, 1)),
            (d["strong_allowed"].astype(jnp.int32).reshape(n_steps, cap, 1),
             pltpu.VMEM, (1, cap, 1)),
            (d["dc_edge"].astype(jnp.int32).reshape(n_steps, cap, 1),
             pltpu.VMEM, (1, cap, 1)),
            (res, pltpu.VMEM, (1, cap, s * s)),
            (d["counts"].reshape(n_steps, 1, 1), pltpu.SMEM, (1, 1, 1)),
        ]
        for arr, space, blk in per_step:
            operands.append(arr)
            in_specs.append(pl.BlockSpec(
                blk, (lambda i, _b=blk: (i,) + (0,) * (len(_b) - 1)),
                memory_space=space))
        # prediction table
        if log2 == 5:
            operands.append(jnp.asarray(_a_bf16_t(32)))
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            operands.append(jnp.asarray(_a_bf16_t(s)))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    maxcap = max(caps)
    cap32 = caps[sizes.index(5)] if 5 in sizes else 8
    kernel = _make_kernel(sizes, tl, n_steps)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((php, PW), jnp.int32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((php, PW), jnp.int32),        # plane
            pltpu.VMEM((tr, tl), jnp.int32),         # planeT
            pltpu.VMEM((maxcap, REFW), jnp.int32),   # refs_l
            pltpu.VMEM((maxcap, REFW), jnp.int32),   # refs_t
            pltpu.VMEM((maxcap, A32_RP), jnp.int32),  # v buffer (s=32)
            pltpu.VMEM((maxcap * 32, 32), jnp.int32),  # tile regroup
            pltpu.VMEM((cap32, 1024), jnp.int32),    # s=32 prediction
            pltpu.VMEM((A32_RP, 1024), jnp.bfloat16),  # A32 DMA slot
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
    return out[:ph, :pw]
