"""TPU pipeline decoder: Stage A host parse -> Stage B device reconstruction.

Subclasses the shared DecoderBase (parsing, DPB, motion context) and routes
reconstruction + loop filters to the device kernels; bit-exact vs golden.
"""
from __future__ import annotations

import numpy as np

from p265_tpu.golden.decoder import DecoderBase, apply_loop_filters
from p265_tpu.plan.frame_plan import build_tensor_plan
from p265_tpu.syntax.ctu import FramePlan


class TpuDecoder(DecoderBase):
    """Annex-B stream -> YUV frames via the TPU reconstruction path."""

    def __init__(self, use_mxu: bool = True, apply_filters: bool = True,
                 filters_on_device: bool = True, use_native_parse: bool = True):
        super().__init__(apply_filters=apply_filters,
                         use_native_parse=use_native_parse)
        self.use_mxu = use_mxu
        self.filters_on_device = filters_on_device

    def _reconstruct(self, plan: FramePlan, refs: dict) -> list[np.ndarray]:
        from p265_tpu.pipeline.wavefront import reconstruct_tpu_scan
        tplan = build_tensor_plan(plan, refs, device_mc=True)
        return reconstruct_tpu_scan(tplan, self.use_mxu)

    def _filters(self, plan: FramePlan, planes: list[np.ndarray]):
        if self.filters_on_device:
            from p265_tpu.kernels.loopfilter import loop_filters_tpu
            return loop_filters_tpu(plan, planes)
        return apply_loop_filters(plan, planes)
