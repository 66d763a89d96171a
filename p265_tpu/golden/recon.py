"""Golden scalar reconstruction: FramePlan -> pre-filter YUV planes.

Sequential z-order walk over TU records; intra prediction reads previously
reconstructed samples (the in-frame dependency the TPU pipeline re-schedules
as wavefronts, SURVEY.md 7.4).
"""
from __future__ import annotations

import numpy as np

from p265_tpu.golden.intra import intra_predict_tu
from p265_tpu.golden.transform import (dequant, inverse_transform,
                                       transform_skip_residual)
from p265_tpu.syntax.ctu import FramePlan
from p265_tpu.tables import chroma_qp_from_luma, clip3


def tu_qp(plan: FramePlan, c_idx: int, luma_qp: int) -> int:
    if c_idx == 0:
        return luma_qp
    off = (plan.pps.cb_qp_offset if c_idx == 1 else plan.pps.cr_qp_offset)
    off += (plan.sh.cb_qp_offset if c_idx == 1 else plan.sh.cr_qp_offset)
    return chroma_qp_from_luma(clip3(0, 57, luma_qp + off))


def reconstruct(plan: FramePlan) -> list[np.ndarray]:
    """Returns [y, cb, cr] int32 planes, pre-loop-filter."""
    sps = plan.sps
    w, h = sps.pic_width, sps.pic_height
    cw, ch = w >> 1, h >> 1
    planes = [np.zeros((h, w), np.int32),
              np.zeros((ch, cw), np.int32),
              np.zeros((ch, cw), np.int32)]
    avails = [np.zeros(((h + 3) >> 2, (w + 3) >> 2), bool),
              np.zeros(((ch + 3) >> 2, (cw + 3) >> 2), bool),
              np.zeros(((ch + 3) >> 2, (cw + 3) >> 2), bool)]
    for tu in plan.tus:
        reconstruct_tu(plan, tu, planes, avails)
    return planes


def reconstruct_tu(plan: FramePlan, tu, planes, avails) -> None:
    size = 1 << tu.log2
    plane = planes[tu.c_idx]
    avail = avails[tu.c_idx]
    pred = intra_predict_tu(plane, avail, tu.x, tu.y, size, tu.mode, tu.c_idx,
                            plan.sps.strong_intra_smoothing)
    if tu.pred_only:
        rec = pred
    else:
        qp = tu_qp(plan, tu.c_idx, tu.qp)
        d = dequant(tu.levels, qp, tu.log2)
        if tu.tskip:
            res = transform_skip_residual(d)
        else:
            is_dst = tu.c_idx == 0 and tu.log2 == 2  # intra luma 4x4 -> DST-VII
            res = inverse_transform(d, tu.log2, is_dst)
        rec = np.clip(pred + res, 0, 255)
    plane[tu.y:tu.y + size, tu.x:tu.x + size] = rec
    avail[tu.y >> 2:(tu.y + size) >> 2, tu.x >> 2:(tu.x + size) >> 2] = True
