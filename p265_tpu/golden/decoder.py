"""Golden scalar HEVC decoder: Annex-B stream -> YUV frames.

This is the oracle (SURVEY.md 4.2): spec-first, sequential, NumPy.  The TPU
pipeline must match it bit-exactly.  Shares Stage-A parsing (hls + syntax)
with the TPU decoder; reconstruction here is the scalar golden path.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from p265_tpu.entropy.engine import CabacDecoder, ContextModels
from p265_tpu.golden import recon as grecon
from p265_tpu.hls import nal
from p265_tpu.hls.bitio import BitReader
from p265_tpu.hls.params import parse_pps, parse_sps
from p265_tpu.hls.slice_header import parse_slice_header
from p265_tpu.syntax.ctu import FramePlan, parse_slice_data


@dataclass
class DecodedFrame:
    poc: int
    planes: list[np.ndarray]        # post-filter [y, cb, cr]
    prefilter: list[np.ndarray]     # pre-filter recon (intra refs / debugging)
    plan: FramePlan


class GoldenDecoder:
    def __init__(self, apply_filters: bool = True):
        self.sps_map = {}
        self.pps_map = {}
        self.apply_filters = apply_filters
        self.frames: list[DecodedFrame] = []

    def decode_stream(self, data: bytes) -> list[DecodedFrame]:
        for unit in nal.split_nal_units(data):
            self.decode_nal(unit)
        return self.frames

    def decode_nal(self, unit: nal.NalUnit) -> None:
        t = unit.nal_type
        if t == nal.NAL_SPS:
            s = parse_sps(unit.rbsp)
            self.sps_map[s.sps_id] = s
        elif t == nal.NAL_PPS:
            p = parse_pps(unit.rbsp)
            self.pps_map[p.pps_id] = p
        elif nal.is_slice_nal(t):
            self._decode_slice(unit)
        # VPS / SEI / AUD / EOS: ignored

    def _decode_slice(self, unit: nal.NalUnit) -> None:
        sh, sps, pps, off = parse_slice_header(
            unit.rbsp, unit.nal_type, self.sps_map, self.pps_map)
        dec = CabacDecoder(BitReader(unit.rbsp[off:]),
                           ContextModels(sh.init_type(), sh.slice_qp))
        plan = parse_slice_data(dec, sps, pps, sh)
        prefilter = grecon.reconstruct(plan)
        planes = [p.copy() for p in prefilter]
        if self.apply_filters:
            planes = apply_loop_filters(plan, planes)
        self.frames.append(DecodedFrame(sh.pic_order_cnt_lsb, planes,
                                        prefilter, plan))


def apply_loop_filters(plan: FramePlan, planes: list[np.ndarray]
                       ) -> list[np.ndarray]:
    from p265_tpu.golden.deblock import deblock_picture
    from p265_tpu.golden.sao import sao_picture
    if not plan.sh.deblocking_filter_disabled:
        planes = deblock_picture(plan, planes)
    if plan.sps.sao_enabled and (plan.sh.sao_luma or plan.sh.sao_chroma):
        planes = sao_picture(plan, planes)
    return planes
