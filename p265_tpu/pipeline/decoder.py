"""TPU pipeline decoder: Stage A host parse -> Stage B device reconstruction.

Subclasses the shared DecoderBase (parsing, DPB, motion context) and routes
reconstruction + loop filters to the device kernels; bit-exact vs golden.

Per decoded picture the device work is ONE fused program (wavefront scan +
deblock + SAO + bypass restore) via pipeline/batch_decode with F=1: on the
axon PJRT tunnel every extra dispatch costs ~1 ms, so the per-stage filter
path (kernels/loopfilter.loop_filters_tpu) loses ~200 ms/frame to dispatch
overhead alone.  Set fused=False to fall back to per-stage device filters.
"""
from __future__ import annotations

import numpy as np

from p265_tpu.golden.decoder import DecoderBase, apply_loop_filters
from p265_tpu.plan.frame_plan import build_tensor_plan
from p265_tpu.syntax.ctu import FramePlan


class TpuDecoder(DecoderBase):
    """Annex-B stream -> YUV frames via the TPU reconstruction path."""

    def __init__(self, use_mxu: bool = True, apply_filters: bool = True,
                 filters_on_device: bool = True, use_native_parse: bool = True,
                 fused: bool = True):
        super().__init__(apply_filters=apply_filters,
                         use_native_parse=use_native_parse)
        self.use_mxu = use_mxu
        self.filters_on_device = filters_on_device
        self.fused = fused and apply_filters and filters_on_device
        self._pending_filtered = None

    def _reconstruct(self, plan: FramePlan, refs: dict) -> list[np.ndarray]:
        ns = getattr(plan, "nstate", None)
        if ns is not None:
            ns.finalize(plan)  # plan.sao must exist before filter packing
        tplan = build_tensor_plan(plan, refs, device_mc=True)
        if self.fused:
            from p265_tpu.pipeline.batch_decode import decode_batch_planes
            pl, pc, fl, fc = decode_batch_planes([tplan], [plan],
                                                 use_mxu=self.use_mxu)
            self._pending_filtered = [
                np.asarray(fl[0], np.int32), np.asarray(fc[0], np.int32),
                np.asarray(fc[1], np.int32)]
            return [np.asarray(pl[0], np.int32), np.asarray(pc[0], np.int32),
                    np.asarray(pc[1], np.int32)]
        from p265_tpu.pipeline.wavefront import reconstruct_tpu_scan
        return reconstruct_tpu_scan(tplan, self.use_mxu)

    def _filters(self, plan: FramePlan, planes: list[np.ndarray]):
        if self.fused and self._pending_filtered is not None:
            out = self._pending_filtered
            self._pending_filtered = None
            return out
        if self.filters_on_device:
            from p265_tpu.kernels.loopfilter import loop_filters_tpu
            return loop_filters_tpu(plan, planes)
        return apply_loop_filters(plan, planes)
