"""CTU-level syntax: coding quadtree, CU/PU/TU, SAO params (spec 7.3.8).

Stage-A design (SURVEY.md 7.1): parsing emits a flat FramePlan (TU records in
reconstruction z-order + per-4x4 metadata maps).  Reconstruction is a separate
pass (golden scalar or TPU kernels) over the plan.  The encoder serializes a
pre-built FramePlan through the same traversal (CtuCoder with is_enc=True and
planner callbacks), so decode/encode stay bit-symmetric by construction.

Intra (I-slice) complete; inter fields live in the same records and are added
by the inter milestone.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from p265_tpu.entropy.engine import CabacDecoder
from p265_tpu.golden.intra import derive_mpm
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.hls.slice_header import SLICE_I, SliceHeader
from p265_tpu.syntax.residual import decode_residual, encode_residual
from p265_tpu.tables import residual_scan_idx

SAO_OFF, SAO_BAND, SAO_EDGE = 0, 1, 2


@dataclass
class TuRec:
    """One transform block in reconstruction order."""
    x: int              # plane coords (luma plane for c_idx 0, chroma plane else)
    y: int
    log2: int           # transform size log2
    c_idx: int          # 0 luma, 1 cb, 2 cr
    mode: int           # intra pred mode for this block's component
    levels: np.ndarray | None  # quantized coefficients [size,size] or None
    tskip: bool = False
    qp: int = 26        # luma QP of covering CU (chroma mapping applied at recon)
    pred_only: bool = False  # cbf == 0: prediction with no residual


@dataclass
class SaoRec:
    type: list[int] = field(default_factory=lambda: [SAO_OFF] * 3)
    cls: list[int] = field(default_factory=lambda: [0] * 3)  # eo class / band pos
    offsets: list[list[int]] = field(default_factory=lambda: [[0] * 4 for _ in range(3)])
    merge_left: bool = False
    merge_up: bool = False


@dataclass
class FramePlan:
    sps: SPS
    pps: PPS
    sh: SliceHeader
    tus: list[TuRec] = field(default_factory=list)
    sao: list[SaoRec] = field(default_factory=list)  # per CTU raster order
    # per-4x4 luma-grid metadata (filled during parse; encoder provides its own)
    intra_mode_map: np.ndarray | None = None   # luma intra mode, -1 unavail/not-intra
    ct_depth_map: np.ndarray | None = None
    qp_map: np.ndarray | None = None
    intra_map: np.ndarray | None = None        # 1 if intra CU
    cbf_map: np.ndarray | None = None          # cbf_luma of covering TU
    edge_flags: np.ndarray | None = None       # bit0: left edge is PU/TU/CU edge; bit1: top
    # inter fields (filled by inter milestone)
    mv_map: np.ndarray | None = None
    ref_map: np.ndarray | None = None

    def grid_shape(self) -> tuple[int, int]:
        return ((self.sps.pic_height + 3) >> 2, (self.sps.pic_width + 3) >> 2)

    def alloc_maps(self) -> None:
        h4, w4 = self.grid_shape()
        self.intra_mode_map = np.full((h4, w4), -1, np.int32)
        self.ct_depth_map = np.zeros((h4, w4), np.int32)
        self.qp_map = np.full((h4, w4), self.sh.slice_qp, np.int32)
        self.intra_map = np.zeros((h4, w4), np.int32)
        self.cbf_map = np.zeros((h4, w4), np.int32)
        self.edge_flags = np.zeros((h4, w4), np.int32)


class _SyntaxIO:
    """Symmetric syntax front-end: decode reads; encode writes given values."""

    def __init__(self, engine, is_enc: bool):
        self.e = engine
        self.is_enc = is_enc

    def flag(self, name: str, inc: int, value: int | None = None) -> int:
        if self.is_enc:
            self.e.encode(name, inc, value)
            return value
        return self.e.decode(name, inc)

    def bypass(self, value: int | None = None) -> int:
        if self.is_enc:
            self.e.encode_bypass(value)
            return value
        return self.e.decode_bypass()

    def bypass_bits(self, n: int, value: int | None = None) -> int:
        if self.is_enc:
            self.e.encode_bypass_bits(value, n)
            return value
        return self.e.decode_bypass_bits(n)

    def terminate(self, value: int | None = None) -> int:
        if self.is_enc:
            self.e.encode_terminate(value)
            return value
        return self.e.decode_terminate()

    def tr_bypass(self, c_max: int, value: int | None = None) -> int:
        if self.is_enc:
            for _ in range(value):
                self.e.encode_bypass(1)
            if value < c_max:
                self.e.encode_bypass(0)
            return value
        v = 0
        while v < c_max and self.e.decode_bypass():
            v += 1
        return v


class CtuCoder:
    """Walks one slice's CTUs, decoding into / encoding from a FramePlan.

    For encoding, a planner object supplies the decisions:
      planner.cu_split(x0, y0, log2, depth) -> bool
      planner.part_nxn(x0, y0) -> bool
      planner.luma_modes(x0, y0) -> list of PU modes (len 1 or 4)
      planner.chroma_mode_idx(x0, y0) -> 0..4 (4 = DM)
      planner.tt_split(x0, y0, log2, depth) -> bool
      planner.cbf(x0, y0, log2, c_idx) -> bool   (plane coords for chroma)
    and plan.tus/plan.sao hold the records to serialize, in traversal order.
    """

    def __init__(self, engine, sps: SPS, pps: PPS, sh: SliceHeader,
                 plan: FramePlan, is_enc: bool, planner=None):
        self.io = _SyntaxIO(engine, is_enc)
        self.engine = engine
        self.is_enc = is_enc
        self.sps, self.pps, self.sh = sps, pps, sh
        self.plan = plan
        self.planner = planner
        if not is_enc:
            plan.alloc_maps()
        else:
            assert planner is not None
            if plan.intra_mode_map is None:
                plan.alloc_maps()
        self.mode_map = plan.intra_mode_map
        self.depth_map = plan.ct_depth_map
        h4, w4 = plan.grid_shape()
        self.avail = np.zeros((h4, w4), bool)
        self._tu_iter = iter(plan.tus) if is_enc else None
        self._sao_iter = iter(plan.sao) if is_enc else None

    # -- helpers -------------------------------------------------------------
    def _avail_at(self, x: int, y: int) -> bool:
        if x < 0 or y < 0 or x >= self.sps.pic_width or y >= self.sps.pic_height:
            return False
        return bool(self.avail[y >> 2, x >> 2])

    def _mark(self, x0: int, y0: int, size: int) -> None:
        x1 = min(x0 + size, self.sps.pic_width)
        y1 = min(y0 + size, self.sps.pic_height)
        self.avail[y0 >> 2:(y1 + 3) >> 2, x0 >> 2:(x1 + 3) >> 2] = True

    def _set_map(self, m: np.ndarray, x0: int, y0: int, size: int, v: int) -> None:
        x1 = min(x0 + size, self.sps.pic_width)
        y1 = min(y0 + size, self.sps.pic_height)
        m[y0 >> 2:(y1 + 3) >> 2, x0 >> 2:(x1 + 3) >> 2] = v

    def _set_edges(self, x0: int, y0: int, size: int) -> None:
        ef = self.plan.edge_flags
        x1 = min(x0 + size, self.sps.pic_width)
        y1 = min(y0 + size, self.sps.pic_height)
        ef[y0 >> 2:(y1 + 3) >> 2, x0 >> 2] |= 1
        ef[y0 >> 2, x0 >> 2:(x1 + 3) >> 2] |= 2

    # -- slice main loop -----------------------------------------------------
    def code_slice_data(self) -> None:
        sps = self.sps
        for ctb_addr in range(sps.num_ctbs):
            xc = (ctb_addr % sps.pic_width_ctbs) << sps.log2_ctb_size
            yc = (ctb_addr // sps.pic_width_ctbs) << sps.log2_ctb_size
            if sps.sao_enabled and (self.sh.sao_luma or self.sh.sao_chroma):
                self._code_sao(ctb_addr)
            elif not self.is_enc:
                self.plan.sao.append(SaoRec())
            self._coding_quadtree(xc, yc, sps.log2_ctb_size, 0)
            last = ctb_addr == sps.num_ctbs - 1
            end = self.io.terminate(int(last))
            if not self.is_enc and bool(end) != last:
                raise ValueError("end_of_slice_segment_flag mismatch")

    # -- SAO (spec 7.3.8.3) --------------------------------------------------
    def _code_sao(self, ctb_addr: int) -> None:
        sh = self.sh
        if self.is_enc:
            rec = next(self._sao_iter)
        else:
            rec = SaoRec()
            self.plan.sao.append(rec)
        wc = self.sps.pic_width_ctbs
        left_ok = ctb_addr % wc != 0
        up_ok = ctb_addr >= wc
        merge = False
        if left_ok:
            rec.merge_left = bool(self.io.flag("sao_merge_flag", 0,
                                               int(rec.merge_left)))
            merge = rec.merge_left
        if not merge and up_ok:
            rec.merge_up = bool(self.io.flag("sao_merge_flag", 0,
                                             int(rec.merge_up)))
            merge = rec.merge_up
        if merge:
            if not self.is_enc:
                src = (self.plan.sao[ctb_addr - 1] if rec.merge_left
                       else self.plan.sao[ctb_addr - wc])
                rec.type = list(src.type)
                rec.cls = list(src.cls)
                rec.offsets = [list(o) for o in src.offsets]
            return
        for c in range(3):
            enabled = sh.sao_luma if c == 0 else sh.sao_chroma
            if not enabled:
                continue
            if c == 2:
                rec.type[2] = rec.type[1]  # cr inherits type idx from cb
            else:
                t = rec.type[c] if self.is_enc else None
                bin0 = self.io.flag("sao_type_idx", 0,
                                    None if t is None else int(t > 0))
                if bin0:
                    bin1 = self.io.bypass(None if t is None else int(t == SAO_EDGE))
                    ty = SAO_EDGE if bin1 else SAO_BAND
                else:
                    ty = SAO_OFF
                rec.type[c] = ty
                if c == 1 and not self.is_enc:
                    rec.type[2] = ty
            ty = rec.type[c]
            if ty == SAO_OFF:
                continue
            mags = [self.io.tr_bypass(7, abs(rec.offsets[c][i]) if self.is_enc else None)
                    for i in range(4)]
            if ty == SAO_BAND:
                offs = []
                for i in range(4):
                    v = mags[i]
                    if v:
                        sgn = self.io.bypass(
                            int(rec.offsets[c][i] < 0) if self.is_enc else None)
                        v = -v if sgn else v
                    offs.append(v)
                rec.offsets[c] = offs
                rec.cls[c] = self.io.bypass_bits(
                    5, rec.cls[c] if self.is_enc else None)
            else:
                # EO: categories 1,2 positive; 3,4 negative (signs inferred)
                rec.offsets[c] = [mags[0], mags[1], -mags[2], -mags[3]]
                if c == 2:
                    rec.cls[2] = rec.cls[1]
                else:
                    rec.cls[c] = self.io.bypass_bits(
                        2, rec.cls[c] if self.is_enc else None)
                    if c == 1 and not self.is_enc:
                        rec.cls[2] = rec.cls[1]

    # -- coding quadtree (spec 7.3.8.4) --------------------------------------
    def _coding_quadtree(self, x0: int, y0: int, log2_size: int, depth: int) -> None:
        sps = self.sps
        size = 1 << log2_size
        inside = (x0 + size <= sps.pic_width) and (y0 + size <= sps.pic_height)
        can_split = log2_size > sps.log2_min_cb_size
        if inside and can_split:
            inc = 0
            if self._avail_at(x0 - 1, y0):
                inc += int(self.depth_map[y0 >> 2, (x0 - 1) >> 2] > depth)
            if self._avail_at(x0, y0 - 1):
                inc += int(self.depth_map[(y0 - 1) >> 2, x0 >> 2] > depth)
            want = int(self.planner.cu_split(x0, y0, log2_size, depth)) \
                if self.is_enc else None
            split = self.io.flag("split_cu_flag", inc, want)
        else:
            split = int(can_split)  # forced split at boundary; leaf at min size
        if split:
            half = size >> 1
            for dy in (0, half):
                for dx in (0, half):
                    x1, y1 = x0 + dx, y0 + dy
                    if x1 < sps.pic_width and y1 < sps.pic_height:
                        self._coding_quadtree(x1, y1, log2_size - 1, depth + 1)
            return
        self._set_map(self.depth_map, x0, y0, size, depth)
        self._coding_unit(x0, y0, log2_size)

    # -- coding unit (spec 7.3.8.5; intra only) ------------------------------
    def _coding_unit(self, x0: int, y0: int, log2_size: int) -> None:
        sps = self.sps
        size = 1 << log2_size
        assert self.sh.slice_type == SLICE_I, "inter CU coding lands next milestone"
        if self.pps.transquant_bypass_enabled:
            raise NotImplementedError("cu_transquant_bypass_flag")
        part_nxn = 0
        if log2_size == sps.log2_min_cb_size:
            want = (int(self.planner.part_nxn(x0, y0)) if self.is_enc else None)
            # bin 1 = PART_2Nx2N, 0 = PART_NxN
            bin0 = self.io.flag("part_mode", 0,
                                None if want is None else 1 - want)
            part_nxn = 1 - bin0
        n_pu = 4 if part_nxn else 1
        pb = size >> 1 if part_nxn else size
        pus = [(x0 + (i & 1) * pb, y0 + (i >> 1) * pb) for i in range(n_pu)]

        modes: list[int | None] = [None] * n_pu
        if self.is_enc:
            modes = list(self.planner.luma_modes(x0, y0))
            assert len(modes) == n_pu
        # pass 1: all prev_intra_luma_pred_flags
        prev_flags = [0] * n_pu
        for i, (px, py) in enumerate(pus):
            if self.is_enc:
                cands = self._mpm_for(i, pus, modes, x0, y0, size)
                prev_flags[i] = int(modes[i] in cands)
                self.io.flag("prev_intra_luma_pred_flag", 0, prev_flags[i])
            else:
                prev_flags[i] = self.io.flag("prev_intra_luma_pred_flag", 0)
        # pass 2: mpm_idx / rem_intra_luma_pred_mode (MPM derived at use time)
        for i, (px, py) in enumerate(pus):
            cands = self._mpm_for(i, pus, modes, x0, y0, size)
            if prev_flags[i]:
                if self.is_enc:
                    self.io.tr_bypass(2, cands.index(modes[i]))
                else:
                    modes[i] = cands[self.io.tr_bypass(2)]
            else:
                scands = sorted(cands)
                if self.is_enc:
                    rem = modes[i]
                    for c in reversed(scands):
                        if rem > c:
                            rem -= 1
                    self.io.bypass_bits(5, rem)
                else:
                    rem = self.io.bypass_bits(5)
                    for c in scands:
                        if rem >= c:
                            rem += 1
                    modes[i] = rem
            self._set_map(self.mode_map, px, py, pb, modes[i])
        # chroma mode (one for the CU in 4:2:0)
        want_idx = (self.planner.chroma_mode_idx(x0, y0) if self.is_enc else None)
        bin0 = self.io.flag("intra_chroma_pred_mode", 0,
                            None if want_idx is None else int(want_idx != 4))
        if bin0:
            cidx = self.io.bypass_bits(2, None if want_idx is None else want_idx)
        else:
            cidx = 4
        chroma_mode = self._chroma_mode_from_idx(cidx, modes[0])

        self._set_map(self.plan.intra_map, x0, y0, size, 1)
        self._set_map(self.plan.qp_map, x0, y0, size, self.sh.slice_qp)
        self._set_edges(x0, y0, size)
        intra_split = part_nxn
        max_depth = sps.max_transform_hierarchy_depth_intra + intra_split
        self._transform_tree(x0, y0, x0, y0, log2_size, 0, 0, modes, chroma_mode,
                             intra_split, max_depth)
        self._mark(x0, y0, size)

    def _mpm_for(self, i: int, pus, modes, x0: int, y0: int, cu_size: int):
        px, py = pus[i]

        def neighbor(nx: int, ny: int, is_above: bool):
            if nx < 0 or ny < 0:
                return None
            if is_above and (ny >> self.sps.log2_ctb_size) != (py >> self.sps.log2_ctb_size):
                return None  # above neighbor outside current CTU row -> DC
            if x0 <= nx < x0 + cu_size and y0 <= ny < y0 + cu_size:
                # inside current CU: an earlier PU of this CU
                pb = cu_size >> 1 if len(modes) > 1 else cu_size
                j = (((ny - y0) // pb) << 1) | ((nx - x0) // pb)
                m = modes[j] if j < len(modes) else None
                return m
            if not self._avail_at(nx, ny):
                return None
            m = int(self.mode_map[ny >> 2, nx >> 2])
            return m if m >= 0 else None

        left = neighbor(px - 1, py, False)
        above = neighbor(px, py - 1, True)
        return derive_mpm(left, above)

    @staticmethod
    def _chroma_mode_from_idx(cidx: int, luma_mode: int) -> int:
        if cidx == 4:
            return luma_mode
        cand = (0, 26, 10, 1)[cidx]
        return 34 if cand == luma_mode else cand

    # -- transform tree (spec 7.3.8.8) ---------------------------------------
    def _transform_tree(self, x0, y0, x_base, y_base, log2_size, depth, blk_idx,
                        modes, chroma_mode, intra_split, max_depth,
                        parent_cbf=(1, 1)):
        sps = self.sps
        size = 1 << log2_size
        if (log2_size <= sps.log2_max_tb_size
                and log2_size > sps.log2_min_tb_size
                and depth < max_depth
                and not (intra_split and depth == 0)):
            want = (int(self.planner.tt_split(x0, y0, log2_size, depth))
                    if self.is_enc else None)
            split = self.io.flag("split_transform_flag", 5 - log2_size, want)
        else:
            split = int(log2_size > sps.log2_max_tb_size
                        or (intra_split and depth == 0))
        cbf_cb, cbf_cr = parent_cbf
        if log2_size > 2:
            if cbf_cb:
                want = (int(self.planner.cbf(x0 >> 1, y0 >> 1, log2_size - 1, 1))
                        if self.is_enc else None)
                cbf_cb = self.io.flag("cbf_chroma", depth, want)
            if cbf_cr:
                want = (int(self.planner.cbf(x0 >> 1, y0 >> 1, log2_size - 1, 2))
                        if self.is_enc else None)
                cbf_cr = self.io.flag("cbf_chroma", depth, want)
        if split:
            half = size >> 1
            for i, (dx, dy) in enumerate(((0, 0), (half, 0), (0, half), (half, half))):
                self._transform_tree(x0 + dx, y0 + dy, x0, y0, log2_size - 1,
                                     depth + 1, i, modes, chroma_mode,
                                     intra_split, max_depth,
                                     parent_cbf=(cbf_cb, cbf_cr))
            return
        # leaf
        want = (int(self.planner.cbf(x0, y0, log2_size, 0)) if self.is_enc else None)
        cbf_luma = self.io.flag("cbf_luma", int(depth == 0), want)
        self._transform_unit(x0, y0, x_base, y_base, log2_size, depth, blk_idx,
                             modes, chroma_mode, cbf_luma, cbf_cb, cbf_cr)

    # -- transform unit (spec 7.3.8.10) --------------------------------------
    def _transform_unit(self, x0, y0, x_base, y_base, log2_size, depth, blk_idx,
                        modes, chroma_mode, cbf_luma, cbf_cb, cbf_cr):
        # luma mode covering this TU: PU index via blk_idx at depth 1 for NxN
        if len(modes) == 1:
            lmode = modes[0]
        else:
            assert depth >= 1
            lmode = modes[blk_idx] if depth == 1 else modes[0]
        qp = self.sh.slice_qp
        if cbf_luma:
            scan = residual_scan_idx(lmode, log2_size, 0)
            self._code_residual(x0, y0, log2_size, 0, scan, lmode, qp)
        else:
            self._pred_only(x0, y0, log2_size, 0, lmode, qp)
        self._set_map(self.plan.cbf_map, x0, y0, 1 << log2_size, int(cbf_luma))
        self._set_edges(x0, y0, 1 << log2_size)
        if log2_size > 2:
            do_chroma, cx, cy, clog2 = True, x0 >> 1, y0 >> 1, log2_size - 1
        elif blk_idx == 3:
            do_chroma, cx, cy, clog2 = True, x_base >> 1, y_base >> 1, 2
        else:
            do_chroma = False
        if do_chroma:
            for c_idx, cbf in ((1, cbf_cb), (2, cbf_cr)):
                if cbf:
                    scan = residual_scan_idx(chroma_mode, clog2, c_idx)
                    self._code_residual(cx, cy, clog2, c_idx, scan, chroma_mode, qp)
                else:
                    self._pred_only(cx, cy, clog2, c_idx, chroma_mode, qp)

    def _pred_only(self, x, y, log2, c_idx, mode, qp) -> None:
        if self.is_enc:
            got = next(self._tu_iter)
            assert got.pred_only and (got.x, got.y, got.log2, got.c_idx) == \
                (x, y, log2, c_idx), ("plan/traversal mismatch",
                                      (got.x, got.y, got.log2, got.c_idx),
                                      (x, y, log2, c_idx))
        else:
            self.plan.tus.append(
                TuRec(x, y, log2, c_idx, mode, None, qp=qp, pred_only=True))

    def _code_residual(self, x, y, log2, c_idx, scan, mode, qp) -> None:
        pps = self.pps
        if self.is_enc:
            tu = next(self._tu_iter)
            assert not tu.pred_only and (tu.x, tu.y, tu.log2, tu.c_idx) == \
                (x, y, log2, c_idx), ("plan/traversal mismatch",
                                      (tu.x, tu.y, tu.log2, tu.c_idx),
                                      (x, y, log2, c_idx))
            encode_residual(self.engine, tu.levels, log2, c_idx, scan,
                            transform_skip_allowed=pps.transform_skip_enabled,
                            sign_data_hiding=pps.sign_data_hiding,
                            tq_bypass=False, tskip=tu.tskip)
        else:
            levels, tskip = decode_residual(
                self.engine, log2, c_idx, scan,
                transform_skip_allowed=pps.transform_skip_enabled,
                sign_data_hiding=pps.sign_data_hiding, tq_bypass=False)
            self.plan.tus.append(TuRec(x, y, log2, c_idx, mode, levels, tskip, qp))


def parse_slice_data(dec: CabacDecoder, sps: SPS, pps: PPS, sh: SliceHeader
                     ) -> FramePlan:
    plan = FramePlan(sps, pps, sh)
    CtuCoder(dec, sps, pps, sh, plan, is_enc=False).code_slice_data()
    return plan
