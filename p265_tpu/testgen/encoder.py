"""Minimal conformant HEVC intra encoder (testgen).

Purpose (SURVEY.md 4.2): there are no conformance streams or reference
encoders in this environment, so this encoder produces the legal Main-profile
bitstreams every other component is tested against.  It needs to be
*conformant and varied*, not good: mode decisions use SAD; split decisions mix
a seeded RNG (syntax coverage) with picture-boundary rules.

Round-trip contract: decode(encode(img)).recon == encoder's own recon,
bit-exact, because the encoder reconstructs through the same golden ops.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from p265_tpu.entropy.engine import CabacEncoder, ContextModels
from p265_tpu.golden.intra import intra_predict_tu
from p265_tpu.golden.recon import tu_qp
from p265_tpu.golden.transform import (dequant, forward_transform,
                                       inverse_transform, quantize,
                                       quantize_transform_skip,
                                       transform_skip_residual)
from p265_tpu.hls import nal
from p265_tpu.hls.bitio import BitWriter
from p265_tpu.hls.params import PPS, SPS, write_pps, write_sps, write_vps
from p265_tpu.hls.slice_header import SLICE_I, SliceHeader, write_slice_header
from p265_tpu.syntax.ctu import CtuCoder, FramePlan, SaoRec, TuRec
from p265_tpu.syntax.residual import apply_sign_data_hiding
from p265_tpu.tables import residual_scan_idx


@dataclass
class EncPlanner:
    """Decision tables filled during planning, consumed during serialization."""
    cu_splits: dict = field(default_factory=dict)
    part_nxns: dict = field(default_factory=dict)
    modes: dict = field(default_factory=dict)
    chroma_idxs: dict = field(default_factory=dict)
    tt_splits: dict = field(default_factory=dict)
    cbfs: dict = field(default_factory=dict)

    def cu_split(self, x0, y0, log2, depth):
        return self.cu_splits[(x0, y0, log2)]

    def part_nxn(self, x0, y0):
        return self.part_nxns[(x0, y0)]

    def luma_modes(self, x0, y0):
        return self.modes[(x0, y0)]

    def chroma_mode_idx(self, x0, y0):
        return self.chroma_idxs[(x0, y0)]

    def tt_split(self, x0, y0, log2, depth):
        return self.tt_splits[(x0, y0, log2)]

    def cbf(self, x, y, log2, c_idx):
        return self.cbfs[(x, y, log2, c_idx)]


class IntraEncoder:
    def __init__(self, sps: SPS, pps: PPS, qp: int = 32, seed: int = 0,
                 full_mode_search: bool = False):
        self.sps, self.pps, self.qp = sps, pps, qp
        self.rng = np.random.default_rng(seed)
        self.full_search = full_mode_search

    # -- public --------------------------------------------------------------
    def encode_frame(self, yuv: list[np.ndarray]) -> tuple[bytes, FramePlan,
                                                           list[np.ndarray]]:
        """-> (annexb_stream_bytes incl. VPS/SPS/PPS, plan, prefilter_recon)."""
        sps, pps = self.sps, self.pps
        self.orig = [p.astype(np.int32) for p in yuv]
        w, h = sps.pic_width, sps.pic_height
        cw, ch = w >> 1, h >> 1
        self.rec = [np.zeros((h, w), np.int32),
                    np.zeros((ch, cw), np.int32),
                    np.zeros((ch, cw), np.int32)]
        self.avail = [np.zeros(((h + 3) >> 2, (w + 3) >> 2), bool),
                      np.zeros(((ch + 3) >> 2, (cw + 3) >> 2), bool),
                      np.zeros(((ch + 3) >> 2, (cw + 3) >> 2), bool)]

        sh = SliceHeader(nal_type=nal.NAL_IDR_W_RADL, slice_type=SLICE_I,
                         slice_qp=self.qp,
                         sao_luma=sps.sao_enabled, sao_chroma=sps.sao_enabled)
        # effective deblock params inherit from PPS (no slice override here)
        sh.deblocking_filter_disabled = pps.deblocking_filter_disabled
        sh.beta_offset_div2 = pps.beta_offset_div2
        sh.tc_offset_div2 = pps.tc_offset_div2
        plan = FramePlan(sps, pps, sh)
        plan.alloc_maps()
        self.plan = plan
        self.planner = EncPlanner()

        # plan all CTUs (greedy, recon interleaved)
        for ctb_addr in range(sps.num_ctbs):
            xc = (ctb_addr % sps.pic_width_ctbs) << sps.log2_ctb_size
            yc = (ctb_addr // sps.pic_width_ctbs) << sps.log2_ctb_size
            if sps.sao_enabled and (sh.sao_luma or sh.sao_chroma):
                plan.sao.append(self._plan_sao(ctb_addr))
            self._plan_cq(xc, yc, sps.log2_ctb_size, 0)

        stream = self._serialize(plan, sh)
        return stream, plan, self.rec

    # -- SAO planning: keep syntax varied but start simple -------------------
    def _plan_sao(self, ctb_addr: int) -> SaoRec:
        rec = SaoRec()
        r = self.rng.random()
        if ctb_addr % self.sps.pic_width_ctbs != 0 and r < 0.15:
            rec.merge_left = True
            src = self.plan.sao[ctb_addr - 1]
            rec.type = list(src.type)
            rec.cls = list(src.cls)
            rec.offsets = [list(o) for o in src.offsets]
            return rec
        if ctb_addr >= self.sps.pic_width_ctbs and r < 0.25:
            rec.merge_up = True
            src = self.plan.sao[ctb_addr - self.sps.pic_width_ctbs]
            rec.type = list(src.type)
            rec.cls = list(src.cls)
            rec.offsets = [list(o) for o in src.offsets]
            return rec
        for c in range(3):
            t = int(self.rng.integers(0, 3))
            if c == 2:
                t = rec.type[1]  # type shared with cb
            rec.type[c] = t
            if t == 1:  # band
                rec.offsets[c] = [int(v) for v in self.rng.integers(-7, 8, 4)]
                rec.cls[c] = int(self.rng.integers(0, 29))
            elif t == 2:  # edge
                mags = [int(v) for v in self.rng.integers(0, 8, 4)]
                rec.offsets[c] = [mags[0], mags[1], -mags[2], -mags[3]]
                rec.cls[c] = (int(self.rng.integers(0, 4)) if c < 2 else rec.cls[1])
                if c == 1:
                    pass
        rec.cls[2] = rec.cls[1] if rec.type[2] == 2 else rec.cls[2]
        return rec

    # -- CU quadtree planning ------------------------------------------------
    def _plan_cq(self, x0, y0, log2_size, depth):
        sps = self.sps
        size = 1 << log2_size
        inside = (x0 + size <= sps.pic_width) and (y0 + size <= sps.pic_height)
        can_split = log2_size > sps.log2_min_cb_size
        if inside and can_split:
            split = bool(self.rng.random() < (0.6 if log2_size >= 5 else 0.4))
            self.planner.cu_splits[(x0, y0, log2_size)] = split
        else:
            split = can_split
        if split:
            half = size >> 1
            for dy in (0, half):
                for dx in (0, half):
                    x1, y1 = x0 + dx, y0 + dy
                    if x1 < sps.pic_width and y1 < sps.pic_height:
                        self._plan_cq(x1, y1, log2_size - 1, depth + 1)
            return
        self._plan_cu(x0, y0, log2_size)

    def _best_mode(self, c_idx, x, y, size, cand_modes):
        plane, avail = self.rec[c_idx], self.avail[c_idx]
        orig = self.orig[c_idx][y:y + size, x:x + size]
        best, best_cost = cand_modes[0], None
        for m in cand_modes:
            pred = intra_predict_tu(plane, avail, x, y, size, m, c_idx,
                                    self.sps.strong_intra_smoothing)
            cost = int(np.abs(orig - pred).sum())
            if best_cost is None or cost < best_cost:
                best, best_cost = m, cost
        return best

    def _plan_cu(self, x0, y0, log2_size):
        sps = self.sps
        size = 1 << log2_size
        part_nxn = False
        if log2_size == sps.log2_min_cb_size:
            part_nxn = bool(self.rng.random() < 0.4)
            self.planner.part_nxns[(x0, y0)] = part_nxn
        n_pu = 4 if part_nxn else 1
        pb = size >> 1 if part_nxn else size

        cand = (list(range(35)) if self.full_search
                else sorted({0, 1, 10, 26, 2, 18, 34,
                             int(self.rng.integers(2, 35)),
                             int(self.rng.integers(2, 35))}))
        # luma mode per PU decided lazily during TU processing would be ideal;
        # decide now from current recon (PU0's refs exact; later PUs' refs
        # approximate until their TUs recon -- decisions need not be optimal)
        modes = []
        for i in range(n_pu):
            px, py = x0 + (i & 1) * pb, y0 + (i >> 1) * pb
            modes.append(self._best_mode(0, px, py, pb, cand))
        self.planner.modes[(x0, y0)] = modes
        cidx = 4 if self.rng.random() < 0.7 else int(self.rng.integers(0, 4))
        self.planner.chroma_idxs[(x0, y0)] = cidx
        chroma_mode = CtuCoder._chroma_mode_from_idx(cidx, modes[0])

        intra_split = part_nxn
        max_depth = sps.max_transform_hierarchy_depth_intra + intra_split
        self._plan_tt(x0, y0, x0, y0, log2_size, 0, 0, modes, chroma_mode,
                      intra_split, max_depth, pb)

    def _plan_tt(self, x0, y0, x_base, y_base, log2_size, depth, blk_idx,
                 modes, chroma_mode, intra_split, max_depth, pb):
        sps = self.sps
        size = 1 << log2_size
        if (log2_size <= sps.log2_max_tb_size
                and log2_size > sps.log2_min_tb_size
                and depth < max_depth
                and not (intra_split and depth == 0)):
            split = bool(self.rng.random() < 0.3)
            self.planner.tt_splits[(x0, y0, log2_size)] = split
        else:
            split = (log2_size > sps.log2_max_tb_size
                     or (intra_split and depth == 0))
        if split:
            half = size >> 1
            for i, (dx, dy) in enumerate(((0, 0), (half, 0), (0, half), (half, half))):
                self._plan_tt(x0 + dx, y0 + dy, x0, y0, log2_size - 1,
                              depth + 1, i, modes, chroma_mode, intra_split,
                              max_depth, pb)
            # chroma cbf decisions for this (split) node were made by children
            # records; cbf at node = OR of children -- computed via map lookup
            self._derive_node_chroma_cbf(x0, y0, log2_size)
            return
        # leaf: luma TU
        lmode = modes[blk_idx] if (len(modes) > 1 and depth == 1) else modes[0]
        self._plan_tu(x0, y0, log2_size, 0, lmode)
        if log2_size > 2:
            self._plan_tu(x0 >> 1, y0 >> 1, log2_size - 1, 1, chroma_mode)
            self._plan_tu(x0 >> 1, y0 >> 1, log2_size - 1, 2, chroma_mode)
        elif blk_idx == 3:
            self._plan_tu(x_base >> 1, y_base >> 1, 2, 1, chroma_mode)
            self._plan_tu(x_base >> 1, y_base >> 1, 2, 2, chroma_mode)
        self._derive_node_chroma_cbf(x0, y0, log2_size)

    def _derive_node_chroma_cbf(self, x0, y0, log2_size):
        """cbf_cb/cr at a node = OR over leaf chroma cbfs inside it."""
        for c in (1, 2):
            cx, cy, clog2 = x0 >> 1, y0 >> 1, log2_size - 1
            key = (cx, cy, clog2, c)
            if key in self.planner.cbfs:
                continue
            csize = 1 << clog2
            val = False
            for (kx, ky, kl, kc), v in list(self.planner.cbfs.items()):
                if kc == c and cx <= kx < cx + csize and cy <= ky < cy + csize:
                    val = val or v
            self.planner.cbfs[key] = val

    def _plan_tu(self, x, y, log2, c_idx, mode):
        size = 1 << log2
        plane, avail = self.rec[c_idx], self.avail[c_idx]
        orig = self.orig[c_idx][y:y + size, x:x + size]
        pred = intra_predict_tu(plane, avail, x, y, size, mode, c_idx,
                                self.sps.strong_intra_smoothing)
        resid = orig - pred
        qp = tu_qp(self.plan, c_idx, self.qp)
        tskip = False
        if (self.pps.transform_skip_enabled and log2 == 2
                and self.rng.random() < 0.2):
            tskip = True
            levels = quantize_transform_skip(resid, qp)
        else:
            is_dst = c_idx == 0 and log2 == 2
            coeffs = forward_transform(resid, log2, is_dst)
            levels = quantize(coeffs, qp, log2)
        if self.pps.sign_data_hiding and levels.any():
            scan = residual_scan_idx(mode, log2, c_idx)
            levels = apply_sign_data_hiding(levels, log2, scan)
        cbf = bool(levels.any())
        self.planner.cbfs[(x, y, log2, c_idx)] = cbf
        if cbf:
            d = dequant(levels, qp, log2)
            res = (transform_skip_residual(d) if tskip
                   else inverse_transform(d, log2, c_idx == 0 and log2 == 2))
            rec = np.clip(pred + res, 0, 255)
            self.plan.tus.append(TuRec(x, y, log2, c_idx, mode, levels, tskip,
                                       self.qp))
        else:
            rec = pred
            self.plan.tus.append(TuRec(x, y, log2, c_idx, mode, None,
                                       qp=self.qp, pred_only=True))
        plane[y:y + size, x:x + size] = rec
        avail[y >> 2:(y + size) >> 2, x >> 2:(x + size) >> 2] = True

    # -- serialization -------------------------------------------------------
    def _serialize(self, plan: FramePlan, sh: SliceHeader) -> bytes:
        sps, pps = self.sps, self.pps
        w = BitWriter()
        write_vps(w)
        vps_rbsp = w.get_bytes()
        w = BitWriter()
        write_sps(w, sps)
        sps_rbsp = w.get_bytes()
        w = BitWriter()
        write_pps(w, pps)
        pps_rbsp = w.get_bytes()

        w = BitWriter()
        write_slice_header(w, sh, sps, pps)
        enc = CabacEncoder(w, ContextModels(sh.init_type(), sh.slice_qp))
        # the serialization traversal also fills plan's metadata maps
        # (identically to what a decoder would derive)
        coder = CtuCoder(enc, sps, pps, sh, plan, is_enc=True,
                         planner=self.planner)
        coder.code_slice_data()
        w.rbsp_trailing_bits()
        slice_rbsp = w.get_bytes()

        return (nal.make_nal(nal.NAL_VPS, vps_rbsp)
                + nal.make_nal(nal.NAL_SPS, sps_rbsp)
                + nal.make_nal(nal.NAL_PPS, pps_rbsp)
                + nal.make_nal(sh.nal_type, slice_rbsp))


def make_test_image(w: int, h: int, seed: int = 0) -> list[np.ndarray]:
    """Synthesizes a structured YUV 4:2:0 test frame (gradients + shapes + noise)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 255 // max(w - 1, 1) + yy * 128 // max(h - 1, 1)) // 2
    # rectangles and circles for edges
    for _ in range(8):
        x0, y0 = int(rng.integers(0, w)), int(rng.integers(0, h))
        ww, hh = int(rng.integers(8, w // 2)), int(rng.integers(8, h // 2))
        y[y0:y0 + hh, x0:x0 + ww] = int(rng.integers(0, 256))
    cy, cx, r = h // 2, w // 2, min(h, w) // 3
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    y[mask] = (y[mask] + 128) % 256
    y = np.clip(y + rng.integers(-8, 9, size=y.shape), 0, 255)
    cb = np.full((h >> 1, w >> 1), 128)
    cr = np.full((h >> 1, w >> 1), 128)
    cb = np.clip(cb + (xx[::2, ::2] * 64 // max(w - 1, 1)) - 32
                 + rng.integers(-4, 5, size=cb.shape), 0, 255)
    cr = np.clip(cr + (yy[::2, ::2] * 64 // max(h - 1, 1)) - 32
                 + rng.integers(-4, 5, size=cr.shape), 0, 255)
    return [y.astype(np.int32), cb.astype(np.int32), cr.astype(np.int32)]
