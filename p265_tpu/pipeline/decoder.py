"""TPU pipeline decoder: Stage A host parse -> Stage B device reconstruction.

Shares all parsing (hls/, entropy/, syntax/) with the golden decoder; the
reconstruction runs as batched wavefront steps on the accelerator
(kernels/intra + kernels/itransform), bit-exact vs golden/recon.

Per-step batches are padded to power-of-two capacities so jit caches a small,
fixed set of compiled programs per resolution (SURVEY.md 7.6).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from p265_tpu.entropy.engine import CabacDecoder, ContextModels
from p265_tpu.golden.decoder import apply_loop_filters
from p265_tpu.hls import nal
from p265_tpu.hls.bitio import BitReader
from p265_tpu.hls.params import parse_pps, parse_sps
from p265_tpu.hls.slice_header import parse_slice_header
from p265_tpu.kernels.intra import predict_batch
from p265_tpu.kernels.itransform import batch_residual
from p265_tpu.plan.frame_plan import TensorPlan, build_tensor_plan
from p265_tpu.syntax.ctu import FramePlan, parse_slice_data

GUARD = 32  # extra rows at the bottom of each plane buffer for padded scatters


def _pow2(n: int, lo: int = 8) -> int:
    c = lo
    while c < n:
        c <<= 1
    return c


def reconstruct_tpu(tplan: TensorPlan, use_mxu: bool = True) -> list[np.ndarray]:
    """Run Stage B on the default device.  Returns pre-filter planes."""
    outs = []
    for pp in tplan.planes:
        ph, pw = pp.shape
        plane = jnp.zeros((ph + GUARD, pw), jnp.int32)
        # residuals for every TU of every bucket, one batched call per bucket
        residuals = {}
        for log2, b in pp.batches.items():
            residuals[log2] = batch_residual(
                jnp.asarray(b.coeffs), jnp.asarray(b.qp),
                jnp.asarray(b.is_dst), jnp.asarray(b.tskip), log2, use_mxu)
        res_np = {k: np.asarray(v) for k, v in residuals.items()}
        # wavefront steps
        for step in range(1, pp.n_steps + 1):
            for log2, b in pp.batches.items():
                size = 1 << log2
                i0 = int(np.searchsorted(b.step, step, "left"))
                i1 = int(np.searchsorted(b.step, step, "right"))
                if i0 == i1:
                    continue
                n = i1 - i0
                cap = _pow2(n)
                nref2 = 2 * (2 * size + 1)

                def pad(a, fill=0):
                    out = np.full((cap,) + a.shape[1:], fill, a.dtype)
                    out[:n] = a[i0:i1]
                    return out

                pos = pad(b.pos)
                pos[n:] = (ph, 0)  # pads write into the guard region
                plane = predict_batch(
                    plane,
                    jnp.asarray(pos),
                    jnp.asarray(pad(b.ref_ys)),
                    jnp.asarray(pad(b.ref_xs)),
                    jnp.asarray(pad(b.ref_ok)),
                    jnp.asarray(pad(b.mode, 1)),
                    jnp.asarray(pad(b.filter_flag)),
                    jnp.asarray(pad(b.strong_allowed)),
                    jnp.asarray(pad(res_np[log2])),
                    size, min(pp.plane_idx, 1))
        outs.append(np.asarray(plane[:ph]))
    return outs


class TpuDecoder:
    """Annex-B stream -> YUV frames via the TPU reconstruction path."""

    def __init__(self, use_mxu: bool = True, apply_filters: bool = True,
                 filters_on_device: bool = True):
        self.sps_map = {}
        self.pps_map = {}
        self.use_mxu = use_mxu
        self.apply_filters = apply_filters
        self.filters_on_device = filters_on_device
        self.frames = []

    def decode_stream(self, data: bytes):
        for unit in nal.split_nal_units(data):
            t = unit.nal_type
            if t == nal.NAL_SPS:
                s = parse_sps(unit.rbsp)
                self.sps_map[s.sps_id] = s
            elif t == nal.NAL_PPS:
                p = parse_pps(unit.rbsp)
                self.pps_map[p.pps_id] = p
            elif nal.is_slice_nal(t):
                self._decode_slice(unit)
        return self.frames

    def _decode_slice(self, unit):
        sh, sps, pps, off = parse_slice_header(
            unit.rbsp, unit.nal_type, self.sps_map, self.pps_map)
        dec = CabacDecoder(BitReader(unit.rbsp[off:]),
                           ContextModels(sh.init_type(), sh.slice_qp))
        plan = parse_slice_data(dec, sps, pps, sh)
        tplan = build_tensor_plan(plan)
        planes = reconstruct_tpu(tplan, self.use_mxu)
        prefilter = [p.copy() for p in planes]
        if self.apply_filters:
            if self.filters_on_device:
                from p265_tpu.kernels.loopfilter import loop_filters_tpu
                planes = loop_filters_tpu(plan, planes)
            else:
                planes = apply_loop_filters(plan, planes)
        self.frames.append((sh.pic_order_cnt_lsb, planes, prefilter, plan))
