"""TPU motion compensation: batched 8-tap luma / 4-tap chroma interpolation
(spec 8.5.4), bit-exact vs golden/inter.py.

Inter PUs are split on the host into fixed-size aligned blocks; the device
kernel gathers edge-clamped reference windows (indices computed on device
from integer MV parts), applies the separable filters as stacked shifted
slices (integer exact), combines uni/bi/weighted prediction, and scatters
into the prediction planes consumed by the wavefront executor.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from p265_tpu.golden.mv import NO_REF
from p265_tpu.tables import CHROMA_FILTER, LUMA_FILTER

BIT_DEPTH = 8
BL = 4   # luma MC block size (minimum PU dimension)
BC = 2   # chroma MC block size


@functools.partial(jax.jit, static_argnames=("block", "taps", "n_refs"))
def _mc_blocks(refs, pos, ref_idx, mv, frac_filters, block: int, taps: int,
               n_refs: int):
    """14-bit MC intermediates for n blocks.

    refs: [n_refs, H, W] int32 reference planes (stacked)
    pos: [n, 2] (y, x) block origin; ref_idx: [n]; mv: [n, 2] (mvx, mvy)
    frac_filters: [n, 2, taps] H and V filter taps for each block
    Returns [n, block, block] int32 (pre-rounding intermediates).
    """
    n = pos.shape[0]
    H, W = refs.shape[1], refs.shape[2]
    half = taps // 2 - 1
    unit = 2 if taps == 8 else 3          # quarter-pel luma / eighth-pel chroma
    ix = pos[:, 1] + (mv[:, 0] >> unit) - half
    iy = pos[:, 0] + (mv[:, 1] >> unit) - half
    span = block + taps - 1
    ys = jnp.clip(iy[:, None] + jnp.arange(span)[None, :], 0, H - 1)
    xs = jnp.clip(ix[:, None] + jnp.arange(span)[None, :], 0, W - 1)
    win = refs[ref_idx[:, None, None], ys[:, :, None], xs[:, None, :]]
    # horizontal: tmp[r, c] = sum_t fH[t] * win[r, c + t], then >> (bd-8)
    fh = frac_filters[:, 0]               # [n, taps]
    fv = frac_filters[:, 1]
    tmp = jnp.zeros((n, span, block), jnp.int32)
    for t in range(taps):
        tmp = tmp + fh[:, t][:, None, None] * win[:, :, t:t + block]
    tmp = tmp >> (BIT_DEPTH - 8)
    out = jnp.zeros((n, block, block), jnp.int32)
    for t in range(taps):
        out = out + fv[:, t][:, None, None] * tmp[:, t:t + block, :]
    return out >> 6


def _combine(p0, p1, has_l1, w_params):
    """uni/bi (+ explicit weighted) combination -> 8-bit samples."""
    if w_params is None:
        uni = jnp.clip((p0 + (1 << 5)) >> 6, 0, 255)
        bi = jnp.clip((p0 + p1 + (1 << 6)) >> 7, 0, 255)
        return jnp.where(has_l1[:, None, None], bi, uni)
    w0, o0, w1, o1, log2_wd = w_params   # [n] each; log2_wd [n]
    shift_u = log2_wd + 6
    pu = (p0 * w0[:, None, None]
          + (1 << (shift_u - 1))[:, None, None]) >> shift_u[:, None, None]
    uni = jnp.clip(pu + o0[:, None, None], 0, 255)
    sb = (p0 * w0[:, None, None] + p1 * w1[:, None, None]
          + ((o0 + o1 + 1)[:, None, None] << (log2_wd + 6)[:, None, None]))
    bi = jnp.clip(sb >> (log2_wd + 7)[:, None, None], 0, 255)
    return jnp.where(has_l1[:, None, None], bi, uni)


def mc_block_arrays(plan, c: int, poc_index: dict):
    """Host: flatten all inter PUs of component c into fixed-size MC block
    arrays (the device kernel's input layout).

    Returns None when the plane has no inter blocks, else a dict with
    pos [n,2], r0/r1 [n], mv0/mv1 [n,2], has1 [n], f0/f1 [n,2,taps] and
    wp (None or 5 [n] arrays: w0, o0, w1, o1, log2_wd)."""
    block = BL if c == 0 else BC
    taps = 8 if c == 0 else 4
    filt = LUMA_FILTER if c == 0 else CHROMA_FILTER
    fmask = 3 if c == 0 else 7
    wt = None
    if ((plan.pps.weighted_pred and plan.sh.slice_type == 1)
            or (plan.pps.weighted_bipred and plan.sh.slice_type == 0)):
        wt = plan.sh.pred_weights
    blocks = []   # (y, x, motion, wp entries)
    for pu in plan.pus:
        m = pu.motion
        x0, y0 = (pu.x, pu.y) if c == 0 else (pu.x >> 1, pu.y >> 1)
        pw, ph_ = (pu.w, pu.h) if c == 0 else (pu.w >> 1, pu.h >> 1)
        ents = None
        if wt is not None:
            ents = [wt.get(lx, m.ref_idx[lx]) if m.uses(lx) else None
                    for lx in range(2)]
        for by in range(y0, y0 + ph_, block):
            for bx in range(x0, x0 + pw, block):
                blocks.append((by, bx, m, ents))
    if not blocks:
        return None
    n = len(blocks)
    pos = np.array([[b[0], b[1]] for b in blocks], np.int32)
    r0 = np.zeros(n, np.int32)
    r1 = np.zeros(n, np.int32)
    mv0 = np.zeros((n, 2), np.int32)
    mv1 = np.zeros((n, 2), np.int32)
    has1 = np.zeros(n, bool)
    f0 = np.zeros((n, 2, taps), np.int32)
    f1 = np.zeros((n, 2, taps), np.int32)
    wp = None
    if wt is not None:
        wp = [np.zeros(n, np.int32) for _ in range(4)] + [
            np.full(n, (wt.luma_log2_denom if c == 0
                        else wt.chroma_log2_denom)
                    + (14 - BIT_DEPTH) - 6, np.int32)]
    for i, (by, bx, m, ents) in enumerate(blocks):
        lanes = [lx for lx in range(2) if m.uses(lx)]
        l0 = lanes[0]
        r0[i] = poc_index[m.ref_poc[l0]]
        mv0[i] = m.mv[l0]
        f0[i, 0] = filt[m.mv[l0][0] & fmask]
        f0[i, 1] = filt[m.mv[l0][1] & fmask]
        if len(lanes) == 2:
            has1[i] = True
            r1[i] = poc_index[m.ref_poc[1]]
            mv1[i] = m.mv[1]
            f1[i, 0] = filt[m.mv[1][0] & fmask]
            f1[i, 1] = filt[m.mv[1][1] & fmask]
        if wp is not None:
            comp_off = 0 if c == 0 else (2 * c)
            e0 = ents[l0]
            wp[0][i], wp[1][i] = e0[comp_off], e0[comp_off + 1]
            if len(lanes) == 2:
                e1 = ents[1]
                wp[2][i], wp[3][i] = e1[comp_off], e1[comp_off + 1]
    return dict(pos=pos, r0=r0, r1=r1, mv0=mv0, mv1=mv1, has1=has1,
                f0=f0, f1=f1, wp=wp, block=block, taps=taps)


def stamp_pcm(plan, out: list) -> None:
    """Overwrite PCM CU pixels with their parsed sample levels (host)."""
    for t in plan.tus:
        if t.pcm:
            sz = 1 << t.log2
            out[t.c_idx][t.y:t.y + sz, t.x:t.x + sz] = t.levels


def build_inter_pred_device(plan, refs: dict):
    """Device-side MC prediction planes (same contract as golden
    build_inter_pred); PCM blocks are still stamped on the host."""
    pcm_tus = [t for t in plan.tus if t.pcm]
    if not plan.pus and not pcm_tus:
        return None
    sps = plan.sps
    w, h = sps.pic_width, sps.pic_height
    poc_list = sorted(refs.keys())
    poc_index = {p: i for i, p in enumerate(poc_list)}
    out = []
    for c in range(3):
        shape = (h, w) if c == 0 else (h >> 1, w >> 1)
        ba = mc_block_arrays(plan, c, poc_index)
        if ba is None:
            out.append(np.zeros(shape, np.int32))
            continue
        block, taps = ba["block"], ba["taps"]
        pos = ba["pos"]
        ref_stack = np.stack([np.asarray(refs[p][c], np.int32)
                              for p in poc_list])
        p0 = _mc_blocks(jnp.asarray(ref_stack), jnp.asarray(pos),
                        jnp.asarray(ba["r0"]), jnp.asarray(ba["mv0"]),
                        jnp.asarray(ba["f0"]), block, taps, len(poc_list))
        p1 = _mc_blocks(jnp.asarray(ref_stack), jnp.asarray(pos),
                        jnp.asarray(ba["r1"]), jnp.asarray(ba["mv1"]),
                        jnp.asarray(ba["f1"]), block, taps, len(poc_list))
        wparams = None
        if ba["wp"] is not None:
            wparams = tuple(jnp.asarray(a) for a in ba["wp"])
        samp = _combine(p0, p1, jnp.asarray(ba["has1"]), wparams)
        plane = jnp.zeros(shape, jnp.int32)
        rows = pos[:, 0][:, None, None] + np.arange(block)[None, :, None]
        cols = pos[:, 1][:, None, None] + np.arange(block)[None, None, :]
        plane = plane.at[jnp.asarray(rows), jnp.asarray(cols)].set(samp)
        out.append(np.asarray(plane))
    stamp_pcm(plan, out)
    return out
