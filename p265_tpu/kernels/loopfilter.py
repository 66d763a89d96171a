"""TPU loop filters: vectorized deblocking + SAO (spec 8.7), bit-exact.

Host side precomputes per-edge-segment parameter grids (bS, beta, tc) from the
FramePlan metadata maps -- sharing the bS derivation with the golden filter --
and per-pixel SAO parameter maps.  Device side is branch-free int32 jnp over
whole planes; the horizontal deblock pass reuses the vertical kernel on the
transposed plane (the filter is 1-D across the edge).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from p265_tpu.golden.deblock import _bs
from p265_tpu.syntax.ctu import SAO_BAND, SAO_EDGE, FramePlan
from p265_tpu.tables import BETA_TABLE, TC_TABLE, chroma_qp_from_luma, clip3

# ---------------------------------------------------------------------------
# host: edge parameter grids
# ---------------------------------------------------------------------------


def luma_edge_params(plan: FramePlan, vertical: bool):
    """-> (bs, beta, tc) int32 arrays [n_seg, n_edges] in the orientation the
    device kernel consumes (transposed layout for horizontal edges)."""
    sps, sh = plan.sps, plan.sh
    w, h = sps.pic_width, sps.pic_height
    ef, qp = plan.edge_flags, plan.qp_map
    boff, toff = sh.beta_offset_div2 << 1, sh.tc_offset_div2 << 1
    n_s = h // 4 if vertical else w // 4
    edges = range(8, w if vertical else h, 8)
    n_e = len(edges)
    bs = np.zeros((n_s, n_e), np.int32)
    beta = np.zeros((n_s, n_e), np.int32)
    tc = np.zeros((n_s, n_e), np.int32)
    for k, e in enumerate(edges):
        for s in range(n_s):
            pos = s * 4
            if vertical:
                if not (ef[pos >> 2, e >> 2] & 1):
                    continue
                b = _bs(plan, (e - 1) >> 2, pos >> 2, e >> 2, pos >> 2)
                qpl = (int(qp[pos >> 2, (e - 1) >> 2])
                       + int(qp[pos >> 2, e >> 2]) + 1) >> 1
            else:
                if not (ef[e >> 2, pos >> 2] & 2):
                    continue
                b = _bs(plan, pos >> 2, (e - 1) >> 2, pos >> 2, e >> 2)
                qpl = (int(qp[(e - 1) >> 2, pos >> 2])
                       + int(qp[e >> 2, pos >> 2]) + 1) >> 1
            if b == 0:
                continue
            bs[s, k] = b
            beta[s, k] = BETA_TABLE[clip3(0, 51, qpl + boff)]
            tc[s, k] = TC_TABLE[clip3(0, 53, qpl + 2 * (b - 1) + toff)]
    return bs, beta, tc


def chroma_edge_params(plan: FramePlan, vertical: bool):
    """-> (tc_cb, tc_cr) [n_seg, n_edges] in chroma coords; 0 = no filter."""
    sps, sh = plan.sps, plan.sh
    w, h = sps.pic_width, sps.pic_height
    ef, qp = plan.edge_flags, plan.qp_map
    toff = sh.tc_offset_div2 << 1
    edges = list(range(16, w if vertical else h, 16))
    n_s = (h if vertical else w) // 8
    tcs = [np.zeros((n_s, len(edges)), np.int32) for _ in range(2)]
    for k, e in enumerate(edges):
        for s in range(n_s):
            pos = s * 8
            if vertical:
                if not (ef[pos >> 2, e >> 2] & 1):
                    continue
                b = _bs(plan, (e - 1) >> 2, pos >> 2, e >> 2, pos >> 2)
                qpl = (int(qp[pos >> 2, (e - 1) >> 2])
                       + int(qp[pos >> 2, e >> 2]) + 1) >> 1
            else:
                if not (ef[e >> 2, pos >> 2] & 2):
                    continue
                b = _bs(plan, pos >> 2, (e - 1) >> 2, pos >> 2, e >> 2)
                qpl = (int(qp[(e - 1) >> 2, pos >> 2])
                       + int(qp[e >> 2, pos >> 2]) + 1) >> 1
            if b < 2:
                continue
            for ci, c_off in enumerate((plan.pps.cb_qp_offset,
                                        plan.pps.cr_qp_offset)):
                qpc = chroma_qp_from_luma(clip3(0, 57, qpl + c_off))
                tcs[ci][s, k] = TC_TABLE[clip3(0, 53, qpc + 2 + toff)]
    return tcs


# ---------------------------------------------------------------------------
# device: deblock
# ---------------------------------------------------------------------------


@jax.jit
def _deblock_luma_vertical(plane, bs, beta, tc):
    """plane [H, W]; bs/beta/tc [H//4, n_e]; edges at x = 8*(k+1)."""
    H, W = plane.shape
    n_e = bs.shape[1]
    cols = 8 * (jnp.arange(n_e) + 1)
    p = [plane[:, cols - 1 - i] for i in range(4)]   # [H, n_e] each
    q = [plane[:, cols + i] for i in range(4)]

    def seg(v):  # [H, n_e] -> [H//4, 4, n_e]
        return v.reshape(H // 4, 4, n_e)

    sp = [seg(v) for v in p]
    sq = [seg(v) for v in q]
    dp0 = jnp.abs(sp[2][:, 0] - 2 * sp[1][:, 0] + sp[0][:, 0])
    dp3 = jnp.abs(sp[2][:, 3] - 2 * sp[1][:, 3] + sp[0][:, 3])
    dq0 = jnp.abs(sq[2][:, 0] - 2 * sq[1][:, 0] + sq[0][:, 0])
    dq3 = jnp.abs(sq[2][:, 3] - 2 * sq[1][:, 3] + sq[0][:, 3])
    d = dp0 + dp3 + dq0 + dq3
    filt = (bs > 0) & (d < beta)

    def strong_line(ln):
        dpl = dp0 if ln == 0 else dp3
        dql = dq0 if ln == 0 else dq3
        return ((2 * (dpl + dql) < (beta >> 2))
                & (jnp.abs(sp[3][:, ln] - sp[0][:, ln])
                   + jnp.abs(sq[0][:, ln] - sq[3][:, ln]) < (beta >> 3))
                & (jnp.abs(sp[0][:, ln] - sq[0][:, ln]) < ((5 * tc + 1) >> 1)))

    strong = strong_line(0) & strong_line(3)         # [H//4, n_e]
    dep1 = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3)
    deq1 = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3)

    def up(m):  # segment mask -> per-line [H, n_e]
        return jnp.repeat(m, 4, axis=0)

    tcl = up(tc)
    p0, p1, p2, p3 = p
    q0, q1, q2, q3 = q
    # strong
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - 2 * tcl, p0 + 2 * tcl)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tcl, p1 + 2 * tcl)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - 2 * tcl, p2 + 2 * tcl)
    sq0 = jnp.clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   q0 - 2 * tcl, q0 + 2 * tcl)
    sq1 = jnp.clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - 2 * tcl, q1 + 2 * tcl)
    sq2 = jnp.clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                   q2 - 2 * tcl, q2 + 2 * tcl)
    # weak
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    wok = jnp.abs(delta) < tcl * 10
    dlt = jnp.clip(delta, -tcl, tcl)
    wp0 = jnp.clip(p0 + dlt, 0, 255)
    wq0 = jnp.clip(q0 - dlt, 0, 255)
    dp_ = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1,
                   -(tcl >> 1), tcl >> 1)
    wp1 = jnp.clip(p1 + dp_, 0, 255)
    dq_ = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1,
                   -(tcl >> 1), tcl >> 1)
    wq1 = jnp.clip(q1 + dq_, 0, 255)

    filt_l = up(filt)
    strong_l = up(filt & strong)
    weak_l = filt_l & ~strong_l & wok
    weakp1 = weak_l & up(dep1)
    weakq1 = weak_l & up(deq1)

    np0 = jnp.where(strong_l, sp0, jnp.where(weak_l, wp0, p0))
    np1 = jnp.where(strong_l, sp1, jnp.where(weakp1, wp1, p1))
    np2 = jnp.where(strong_l, sp2, p2)
    nq0 = jnp.where(strong_l, sq0, jnp.where(weak_l, wq0, q0))
    nq1 = jnp.where(strong_l, sq1, jnp.where(weakq1, wq1, q1))
    nq2 = jnp.where(strong_l, sq2, q2)

    plane = plane.at[:, cols - 1].set(np0)
    plane = plane.at[:, cols - 2].set(np1)
    plane = plane.at[:, cols - 3].set(np2)
    plane = plane.at[:, cols + 0].set(nq0)
    plane = plane.at[:, cols + 1].set(nq1)
    plane = plane.at[:, cols + 2].set(nq2)
    return plane


@jax.jit
def _deblock_chroma_vertical(plane, tc):
    """plane [Hc, Wc]; tc [Hc//4, n_e]; edges at x = 8*(k+1) chroma samples."""
    Hc, Wc = plane.shape
    n_e = tc.shape[1]
    cols = 8 * (jnp.arange(n_e) + 1)
    p1 = plane[:, cols - 2]
    p0 = plane[:, cols - 1]
    q0 = plane[:, cols + 0]
    q1 = plane[:, cols + 1]
    tcl = jnp.repeat(tc, 4, axis=0)
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tcl, tcl)
    on = tcl > 0
    np0 = jnp.where(on, jnp.clip(p0 + delta, 0, 255), p0)
    nq0 = jnp.where(on, jnp.clip(q0 - delta, 0, 255), q0)
    plane = plane.at[:, cols - 1].set(np0)
    plane = plane.at[:, cols + 0].set(nq0)
    return plane


def deblock_tpu(plan: FramePlan, planes: list) -> list:
    y, cb, cr = (jnp.asarray(p) for p in planes)
    # vertical then horizontal (horizontal = vertical kernel on transpose)
    bs, beta, tc = luma_edge_params(plan, vertical=True)
    if bs.size:
        y = _deblock_luma_vertical(y, jnp.asarray(bs), jnp.asarray(beta),
                                   jnp.asarray(tc))
    tcb, tcr = chroma_edge_params(plan, vertical=True)
    if tcb.size:
        cb = _deblock_chroma_vertical(cb, jnp.asarray(tcb))
        cr = _deblock_chroma_vertical(cr, jnp.asarray(tcr))
    bs, beta, tc = luma_edge_params(plan, vertical=False)
    if bs.size:
        y = _deblock_luma_vertical(y.T, jnp.asarray(bs), jnp.asarray(beta),
                                   jnp.asarray(tc)).T
    tcb, tcr = chroma_edge_params(plan, vertical=False)
    if tcb.size:
        cb = _deblock_chroma_vertical(cb.T, jnp.asarray(tcb)).T
        cr = _deblock_chroma_vertical(cr.T, jnp.asarray(tcr)).T
    return [y, cb, cr]


# ---------------------------------------------------------------------------
# SAO
# ---------------------------------------------------------------------------

_EO = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (-1, 1, 1, -1))


def _sao_maps(plan: FramePlan, c: int):
    """Per-CTU parameter grids (tiny); expansion to pixels happens on device."""
    sps = plan.sps
    nx, ny = sps.pic_width_ctbs, sps.pic_height_ctbs
    ty = np.zeros((ny, nx), np.int32)
    cls = np.zeros((ny, nx), np.int32)
    offs = np.zeros((4, ny, nx), np.int32)
    for a, rec in enumerate(plan.sao):
        iy, ix = divmod(a, nx)
        ty[iy, ix] = rec.type[c]
        cls[iy, ix] = rec.cls[c]
        for i in range(4):
            offs[i, iy, ix] = rec.offsets[c][i]
    return ty, cls, offs


@functools.partial(jax.jit, static_argnames=("ctb",))
def _sao_apply(src, ty_g, cls_g, offs_g, ctb: int):
    H, W = src.shape

    def expand(m):  # [ny, nx] -> [H, W] on device
        e = jnp.repeat(jnp.repeat(m, ctb, axis=0), ctb, axis=1)
        return e[:H, :W]

    ty = expand(ty_g)
    cls = expand(cls_g)
    o0, o1, o2, o3 = (expand(offs_g[i]) for i in range(4))
    v = src
    # band
    band = v >> 3
    rel = (band - cls) & 31
    d_band = jnp.where(rel == 0, o0, 0) + jnp.where(rel == 1, o1, 0) \
        + jnp.where(rel == 2, o2, 0) + jnp.where(rel == 3, o3, 0)
    # edge: compute for all 4 classes, select by cls
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    d_edges = []
    for (dy0, dx0, dy1, dx1) in _EO:
        n0 = jnp.roll(jnp.roll(v, -dy0, 0), -dx0, 1)
        n1 = jnp.roll(jnp.roll(v, -dy1, 0), -dx1, 1)
        valid = ((yy + dy0 >= 0) & (yy + dy0 < H) & (xx + dx0 >= 0)
                 & (xx + dx0 < W) & (yy + dy1 >= 0) & (yy + dy1 < H)
                 & (xx + dx1 >= 0) & (xx + dx1 < W))
        e = jnp.sign(v - n0) + jnp.sign(v - n1)
        d = jnp.where(e == -2, o0, 0) + jnp.where(e == -1, o1, 0) \
            + jnp.where(e == 1, o2, 0) + jnp.where(e == 2, o3, 0)
        d_edges.append(jnp.where(valid, d, 0))
    d_edge = jnp.where(cls == 0, d_edges[0],
                       jnp.where(cls == 1, d_edges[1],
                                 jnp.where(cls == 2, d_edges[2], d_edges[3])))
    delta = jnp.where(ty == SAO_BAND, d_band,
                      jnp.where(ty == SAO_EDGE, d_edge, 0))
    return jnp.clip(v + delta, 0, 255)


def sao_tpu(plan: FramePlan, planes: list) -> list:
    sh = plan.sh
    outs = []
    for c in range(3):
        enabled = sh.sao_luma if c == 0 else sh.sao_chroma
        if not enabled:
            outs.append(planes[c])
            continue
        ty, cls, offs = _sao_maps(plan, c)
        ctb = plan.sps.ctb_size if c == 0 else plan.sps.ctb_size >> 1
        outs.append(_sao_apply(jnp.asarray(planes[c]), jnp.asarray(ty),
                               jnp.asarray(cls), jnp.asarray(offs), ctb))
    return outs


def loop_filters_tpu(plan: FramePlan, planes: list) -> list:
    from p265_tpu.golden.decoder import bypass_pixel_masks
    masks = bypass_pixel_masks(plan)
    orig = [np.asarray(p).copy() for p in planes] if masks else None
    out = [jnp.asarray(p) for p in planes]
    if not plan.sh.deblocking_filter_disabled:
        out = deblock_tpu(plan, out)
    if plan.sps.sao_enabled and (plan.sh.sao_luma or plan.sh.sao_chroma):
        out = sao_tpu(plan, out)
    res = [np.asarray(p) for p in out]
    if masks:
        res = [np.where(m, o, p) for m, o, p in zip(masks, orig, res)]
    return res
