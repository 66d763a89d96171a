"""Native Stage-A slice parsing: ctypes bindings for ctu.c's per-CTU parser
plus vectorized tensor-plan assembly.

Per picture, a NativeParseState owns the output buffers (size-bucketed TU
record arrays, SAO records, wavefront state); CtuCoder calls parse_ctu once
per CTU (segment/WPP/tile orchestration stays in Python, where it is cheap).
build_tensor_plan() consumes the buckets directly -- no per-TU Python objects
anywhere on this path.

Supported natively: I slices without PCM (syntax/ctu.py remains the
reference and the fallback; tests assert the two parsers agree bit-exactly
on the decoded YUV).
"""
from __future__ import annotations

import ctypes

import numpy as np

from p265_tpu.tables import (CHROMA_QP_TABLE, CTX_OFFSET,
                             INTRA_HOR_VER_DIST_THRES)
from p265_tpu.native import _Cabac, _load


class _NCtx(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int) for n in (
        "split_cu_flag", "cu_transquant_bypass_flag", "cu_skip_flag",
        "merge_flag", "merge_idx", "part_mode", "pred_mode_flag",
        "prev_intra_luma_pred_flag", "intra_chroma_pred_mode",
        "inter_pred_idc", "abs_mvd_greater_flag", "ref_idx", "mvp_flag",
        "cu_qp_delta_abs", "cbf_luma", "cbf_chroma", "rqt_root_cbf",
        "sao_merge_flag", "sao_type_idx", "split_transform_flag",
        "transform_skip_flag", "last_x", "last_y", "csbf", "sig", "gt1",
        "gt2")]


class _NParams(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int) for n in (
        "pic_width", "pic_height", "log2_ctb", "log2_min_cb", "log2_min_tb",
        "log2_max_tb", "max_tt_depth_intra", "w4", "h4", "wc",
        "transform_skip_enabled", "sign_data_hiding", "cu_qp_delta_enabled",
        "min_qg_log2", "transquant_bypass_enabled", "strong_intra_smoothing",
        "scaling_enabled", "slice_qp", "slice_idx", "slice_type",
        "sao_luma", "sao_chroma")]


_I32P = ctypes.POINTER(ctypes.c_int32)
_I16P = ctypes.POINTER(ctypes.c_int16)
_U8P = ctypes.POINTER(ctypes.c_uint8)


class _NMaps(ctypes.Structure):
    _fields_ = [
        ("mode_map", _I32P), ("depth_map", _I32P), ("qp_map", _I32P),
        ("intra_map", _I32P), ("cbf_map", _I32P), ("edge_flags", _I32P),
        ("skip_map", _I32P), ("bypass_map", _I32P), ("avail", _U8P),
        ("tile_map4", _I32P), ("slice_of_ctb", _I32P)]


class _NQp(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int) for n in (
        "last_cu_qp", "pred", "delta", "delta_coded", "qg_x", "qg_y")]


class _NBucket(ctypes.Structure):
    _fields_ = [
        ("meta", _I32P), ("coeffs", _I16P), ("ref_ys", _I16P),
        ("ref_xs", _I16P), ("ref_ok", _U8P), ("ok_scan", _U8P),
        ("count", ctypes.c_int32), ("cap", ctypes.c_int32)]


class _NPlane(ctypes.Structure):
    _fields_ = [
        ("tavail", _U8P), ("tstep", _I32P),
        ("pw", ctypes.c_int32), ("ph", ctypes.c_int32),
        ("pw4", ctypes.c_int32), ("ph4", ctypes.c_int32),
        ("last_tile", ctypes.c_int32), ("last_slice", ctypes.c_int32),
        ("n_steps", ctypes.c_int32)]


_NCTX = None


def _nctx():
    global _NCTX
    if _NCTX is None:
        _NCTX = _NCtx(
            split_cu_flag=CTX_OFFSET["split_cu_flag"],
            cu_transquant_bypass_flag=CTX_OFFSET["cu_transquant_bypass_flag"],
            cu_skip_flag=CTX_OFFSET["cu_skip_flag"],
            merge_flag=CTX_OFFSET["merge_flag"],
            merge_idx=CTX_OFFSET["merge_idx"],
            part_mode=CTX_OFFSET["part_mode"],
            pred_mode_flag=CTX_OFFSET["pred_mode_flag"],
            prev_intra_luma_pred_flag=CTX_OFFSET["prev_intra_luma_pred_flag"],
            intra_chroma_pred_mode=CTX_OFFSET["intra_chroma_pred_mode"],
            inter_pred_idc=CTX_OFFSET["inter_pred_idc"],
            abs_mvd_greater_flag=CTX_OFFSET["abs_mvd_greater_flag"],
            ref_idx=CTX_OFFSET["ref_idx"],
            mvp_flag=CTX_OFFSET["mvp_flag"],
            cu_qp_delta_abs=CTX_OFFSET["cu_qp_delta_abs"],
            cbf_luma=CTX_OFFSET["cbf_luma"],
            cbf_chroma=CTX_OFFSET["cbf_chroma"],
            rqt_root_cbf=CTX_OFFSET["rqt_root_cbf"],
            sao_merge_flag=CTX_OFFSET["sao_merge_flag"],
            sao_type_idx=CTX_OFFSET["sao_type_idx"],
            split_transform_flag=CTX_OFFSET["split_transform_flag"],
            transform_skip_flag=CTX_OFFSET["transform_skip_flag"],
            last_x=CTX_OFFSET["last_sig_coeff_x_prefix"],
            last_y=CTX_OFFSET["last_sig_coeff_y_prefix"],
            csbf=CTX_OFFSET["coded_sub_block_flag"],
            sig=CTX_OFFSET["sig_coeff_flag"],
            gt1=CTX_OFFSET["coeff_abs_level_greater1_flag"],
            gt2=CTX_OFFSET["coeff_abs_level_greater2_flag"])
    return _NCTX


_ctu_lib = None


def _ctu_load():
    global _ctu_lib
    if _ctu_lib is not None:
        return _ctu_lib
    lib = _load()
    if lib is None or not hasattr(lib, "ctu_parse"):
        return None
    lib.ctu_parse.argtypes = [
        ctypes.POINTER(_Cabac), ctypes.POINTER(_NParams),
        ctypes.POINTER(_NMaps), ctypes.POINTER(_NQp),
        ctypes.POINTER(_NBucket), ctypes.POINTER(_NPlane), _I32P,
        ctypes.POINTER(_NCtx), ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ctu_parse.restype = ctypes.c_int
    _ctu_lib = lib
    return lib


def native_parse_available() -> bool:
    return _ctu_load() is not None


def supports(sps, pps, sh) -> bool:
    """Can this slice be parsed natively?  (I slice, no PCM.)"""
    from p265_tpu.hls.slice_header import SLICE_I
    return (sh.slice_type == SLICE_I and not sps.pcm_enabled
            and native_parse_available())


def _ptr(a, ct):
    return a.ctypes.data_as(ct)


LOG2_SIZES = (2, 3, 4, 5)


class NativeParseState:
    """Per-picture native parse output: bucketed TU records + SAO + planes."""

    def __init__(self, sps, pps):
        self.sps, self.pps = sps, pps
        h, w = sps.pic_height, sps.pic_width
        shapes = [(h, w), (h >> 1, w >> 1), (h >> 1, w >> 1)]
        self.shapes = shapes
        self.buckets = {}           # (p_idx, log2) -> dict of numpy arrays
        self._bk = (_NBucket * 12)()
        for p in range(3):
            ph, pw = shapes[p]
            for log2 in LOG2_SIZES:
                s = 1 << log2
                cap = max(((pw + s - 1) // s) * ((ph + s - 1) // s), 1)
                nref2 = 2 * (2 * s + 1)
                n41 = 4 * s + 1
                d = dict(
                    meta=np.zeros((cap, 8), np.int32),
                    coeffs=np.zeros((cap, s * s), np.int16),
                    ref_ys=np.zeros((cap, nref2), np.int16),
                    ref_xs=np.zeros((cap, nref2), np.int16),
                    ref_ok=np.zeros((cap, nref2), np.uint8),
                    ok_scan=np.zeros((cap, n41), np.uint8),
                )
                self.buckets[(p, log2)] = d
                b = self._bk[p * 4 + (log2 - 2)]
                b.meta = _ptr(d["meta"], _I32P)
                b.coeffs = _ptr(d["coeffs"], _I16P)
                b.ref_ys = _ptr(d["ref_ys"], _I16P)
                b.ref_xs = _ptr(d["ref_xs"], _I16P)
                b.ref_ok = _ptr(d["ref_ok"], _U8P)
                b.ok_scan = _ptr(d["ok_scan"], _U8P)
                b.count = 0
                b.cap = cap
        self._pl = (_NPlane * 3)()
        self._pl_bufs = []
        for p in range(3):
            ph, pw = shapes[p]
            ph4, pw4 = (ph + 3) >> 2, (pw + 3) >> 2
            tavail = np.zeros(ph4 * pw4, np.uint8)
            tstep = np.zeros(ph4 * pw4, np.int32)
            self._pl_bufs.append((tavail, tstep))
            pl = self._pl[p]
            pl.tavail = _ptr(tavail, _U8P)
            pl.tstep = _ptr(tstep, _I32P)
            pl.pw, pl.ph, pl.pw4, pl.ph4 = pw, ph, pw4, ph4
            pl.last_tile = -1
            pl.last_slice = -1
            pl.n_steps = 0
        self.sao = np.zeros(sps.num_ctbs * 20, np.int32)
        self._qp = _NQp()
        self._params = None
        self._maps = None
        self._maps_keepalive = None

    # -- per-slice setup ------------------------------------------------------
    def begin_slice(self, sps, pps, sh, plan, avail, slice_idx: int) -> None:
        self._params = _NParams(
            pic_width=sps.pic_width, pic_height=sps.pic_height,
            log2_ctb=sps.log2_ctb_size, log2_min_cb=sps.log2_min_cb_size,
            log2_min_tb=sps.log2_min_tb_size, log2_max_tb=sps.log2_max_tb_size,
            max_tt_depth_intra=sps.max_transform_hierarchy_depth_intra,
            w4=(sps.pic_width + 3) >> 2, h4=(sps.pic_height + 3) >> 2,
            wc=sps.pic_width_ctbs,
            transform_skip_enabled=int(pps.transform_skip_enabled),
            sign_data_hiding=int(pps.sign_data_hiding),
            cu_qp_delta_enabled=int(pps.cu_qp_delta_enabled),
            min_qg_log2=sps.log2_ctb_size - pps.diff_cu_qp_delta_depth,
            transquant_bypass_enabled=int(pps.transquant_bypass_enabled),
            strong_intra_smoothing=int(sps.strong_intra_smoothing),
            scaling_enabled=int(sps.scaling_list_enabled),
            slice_qp=sh.slice_qp, slice_idx=slice_idx,
            slice_type=sh.slice_type,
            sao_luma=int(sh.sao_luma), sao_chroma=int(sh.sao_chroma))
        maps = (plan.intra_mode_map, plan.ct_depth_map, plan.qp_map,
                plan.intra_map, plan.cbf_map, plan.edge_flags,
                plan.skip_map, plan.bypass_map)
        for m in maps:
            assert m.dtype == np.int32 and m.flags["C_CONTIGUOUS"]
        assert avail.dtype == np.bool_ and avail.flags["C_CONTIGUOUS"]
        assert plan.tile_map4.dtype == np.int32
        assert plan.slice_of_ctb.dtype == np.int32
        self._maps_keepalive = (maps, avail, plan.tile_map4, plan.slice_of_ctb)
        self._maps = _NMaps(
            mode_map=_ptr(maps[0], _I32P), depth_map=_ptr(maps[1], _I32P),
            qp_map=_ptr(maps[2], _I32P), intra_map=_ptr(maps[3], _I32P),
            cbf_map=_ptr(maps[4], _I32P), edge_flags=_ptr(maps[5], _I32P),
            skip_map=_ptr(maps[6], _I32P), bypass_map=_ptr(maps[7], _I32P),
            avail=avail.ctypes.data_as(_U8P),
            tile_map4=_ptr(plan.tile_map4, _I32P),
            slice_of_ctb=_ptr(plan.slice_of_ctb, _I32P))

    def start_segment(self, slice_qp: int) -> None:
        q = self._qp
        q.last_cu_qp = slice_qp
        q.pred = slice_qp
        q.delta = 0
        q.delta_coded = int(not self.pps.cu_qp_delta_enabled)
        q.qg_x = q.qg_y = 0

    def parse_ctu(self, engine, ctb_addr: int, cur_tile: int,
                  do_sao: bool) -> int:
        """-> end_of_slice_segment_flag; raises on corrupt stream."""
        lib = _ctu_load()
        r = lib.ctu_parse(
            ctypes.byref(engine._c), ctypes.byref(self._params),
            ctypes.byref(self._maps), ctypes.byref(self._qp),
            self._bk, self._pl, _ptr(self.sao, _I32P),
            ctypes.byref(_nctx()), ctb_addr, cur_tile, int(do_sao))
        if r < 0:
            raise ValueError(f"native CTU parse failed (code {r}) "
                             f"at CTB {ctb_addr}")
        return r

    # -- per-picture finalization ---------------------------------------------
    def total_tus(self) -> int:
        return sum(self._bk[i].count for i in range(12))

    def finalize(self, plan) -> None:
        """Convert the native SAO array into plan.sao SaoRec records.
        Idempotent: callers on both the sequential and pipelined paths may
        invoke it before using plan.sao."""
        if getattr(self, "_finalized", False):
            return
        self._finalized = True
        from p265_tpu.syntax.ctu import SaoRec
        rec = self.sao.reshape(-1, 20)
        out = []
        for a in range(rec.shape[0]):
            r = rec[a]
            out.append(SaoRec(
                type=[int(r[0]), int(r[1]), int(r[2])],
                cls=[int(r[3]), int(r[4]), int(r[5])],
                offsets=[[int(v) for v in r[6 + 4 * c:10 + 4 * c]]
                         for c in range(3)],
                merge_left=bool(r[18]), merge_up=bool(r[19])))
        plan.sao = out

    def tensor_plan(self, plan):
        """Vectorized TuBatch assembly (mirrors frame_plan.build_tensor_plan
        for the all-intra case)."""
        from p265_tpu.plan.frame_plan import PlanePlan, TensorPlan, TuBatch
        sps, pps, sh = plan.sps, plan.pps, plan.sh
        planes = []
        for p_idx in range(3):
            pl = self._pl[p_idx]
            pp = PlanePlan(p_idx, self.shapes[p_idx], int(pl.n_steps))
            for log2 in LOG2_SIZES:
                bk = self._bk[p_idx * 4 + (log2 - 2)]
                m = int(bk.count)
                if m == 0:
                    continue
                size = 1 << log2
                d = self.buckets[(p_idx, log2)]
                meta = d["meta"][:m]
                order = np.argsort(meta[:, 2], kind="stable")
                meta = meta[order]
                flags = meta[:, 5]
                qp = meta[:, 4]
                if p_idx:
                    off = ((pps.cb_qp_offset if p_idx == 1 else pps.cr_qp_offset)
                           + (sh.cb_qp_offset if p_idx == 1 else sh.cr_qp_offset))
                    qp = CHROMA_QP_TABLE[np.clip(qp + off, 0, 57)]
                mode = meta[:, 3]
                has_res = (flags & 2) == 0
                tskip = (flags & 1) != 0
                bypass = (flags & 8) != 0
                if p_idx == 0 and size != 4:
                    thresh = INTRA_HOR_VER_DIST_THRES.get(size, 10)
                    mdist = np.minimum(np.abs(mode - 26), np.abs(mode - 10))
                    ff = (mode != 1) & (mdist > thresh)
                else:
                    ff = np.zeros(m, bool)
                scale_m = None
                if plan.scaling is not None:
                    nmid = 2 if log2 == 5 else 6
                    lut = np.stack([plan.scaling[(log2, mid)]
                                    for mid in range(nmid)])
                    scale_m = lut[meta[:, 6]]
                b = TuBatch(
                    size=size,
                    pos=np.ascontiguousarray(meta[:, 0:2]),
                    step=np.ascontiguousarray(meta[:, 2]),
                    coeffs=d["coeffs"][:m][order].astype(np.int32).reshape(
                        m, size, size),
                    qp=qp.astype(np.int32),
                    mode=mode.astype(np.int32),
                    c_idx=np.full(m, p_idx, np.int32),
                    is_dst=np.full(m, p_idx == 0 and log2 == 2, bool),
                    tskip=tskip,
                    has_res=has_res,
                    bypass=bypass,
                    scale_m=scale_m,
                    inter=np.zeros(m, bool),
                    filter_flag=ff,
                    strong_allowed=(ff if (p_idx == 0 and size == 32
                                           and sps.strong_intra_smoothing)
                                    else np.zeros(m, bool)),
                    dc_edge=np.full(m, p_idx == 0 and size < 32, bool),
                    ref_ys=d["ref_ys"][:m][order].astype(np.int32),
                    ref_xs=d["ref_xs"][:m][order].astype(np.int32),
                    ref_ok=d["ref_ok"][:m][order].astype(bool),
                    ok_scan=d["ok_scan"][:m][order].astype(bool),
                )
                pp.batches[log2] = b
            planes.append(pp)
        return TensorPlan(planes, plan)
