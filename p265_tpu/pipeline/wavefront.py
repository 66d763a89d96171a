"""Device-resident wavefront executor: one lax.scan over steps per plane.

All per-step TU data is stacked into [n_steps, capacity, ...] tensors on the
host once, shipped to the device once, and consumed by a single compiled
scan -- no per-step host round trips (this was a 100x dispatch-overhead trap
in the naive loop).  Capacities are bucketed to powers of two and the step
count padded so compilations cache across frames of a stream.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from p265_tpu.kernels.intra import predict_batch
from p265_tpu.kernels.intra_mxu import predict_batch_mxu
from p265_tpu.kernels.itransform import batch_residual

USE_MXU_INTRA = True  # matmul-formulated intra predictor (kernels/intra_mxu)
from p265_tpu.plan.frame_plan import PlanePlan, TensorPlan

GUARD = 32


USE_PALLAS_RESIDUAL = False  # opt-in: faster per-op, but the pipeline's
# small ragged buckets lose more to 128-TU padding than the fusion saves;
# revisit with bucket packing (BASELINE.md round-2 notes)


def _residual_for(b, log2: int, use_mxu: bool):
    """Residuals for a TuBatch: fused Pallas kernel (opt-in) or XLA path."""
    if (USE_PALLAS_RESIDUAL and b.scale_m is None
            and jax.default_backend() != "cpu"):
        from p265_tpu.kernels.pallas_itransform import pallas_batch_residual
        return pallas_batch_residual(
            jnp.asarray(b.coeffs), jnp.asarray(b.qp), jnp.asarray(b.is_dst),
            jnp.asarray(b.tskip), jnp.asarray(b.bypass), log2)
    sm = None if b.scale_m is None else jnp.asarray(b.scale_m)
    return batch_residual(
        jnp.asarray(b.coeffs), jnp.asarray(b.qp), jnp.asarray(b.is_dst),
        jnp.asarray(b.tskip), log2, use_mxu, bypass=jnp.asarray(b.bypass),
        scale_m=sm)


def _pow2(n: int, lo: int = 8) -> int:
    c = lo
    while c < n:
        c <<= 1
    return c


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _stack_plane(pp: PlanePlan):
    """Host: per-size stacked step tensors + residual gather maps (cached)."""
    cached = getattr(pp, "_stacked_cache", None)
    if cached is not None:
        return cached
    n_steps = _round_up(max(pp.n_steps, 1), 8)
    out = {}
    for log2, b in pp.batches.items():
        size = 1 << log2
        counts = np.bincount(b.step, minlength=n_steps + 1)[1:n_steps + 1]
        cap = _pow2(int(counts.max()) if counts.size else 1)
        n = len(b.step)
        # index map into the bucket axis; n = pad slot (points past real TUs)
        # vectorized: lane l of step-row s holds starts[s]+l while < starts[s+1]
        starts = np.searchsorted(b.step, np.arange(1, n_steps + 2))
        lane = np.arange(cap)[None, :]
        idx_map = starts[:n_steps, None] + lane
        idx_map = np.where(idx_map < starts[1:n_steps + 1, None], idx_map, n)
        idx_map = idx_map.astype(np.int32)

        def pad_gather(a, fill=0):
            ap = np.concatenate([a, np.full((1,) + a.shape[1:], fill, a.dtype)])
            return ap[idx_map]

        ph, pw = pp.shape
        pos = pad_gather(b.pos)
        pos[idx_map == n] = (ph, 0)  # pads scatter into the guard region
        out[log2] = dict(
            idx_map=idx_map,
            pos=pos,
            ref_ys=pad_gather(b.ref_ys),
            ref_xs=pad_gather(b.ref_xs),
            ref_ok=pad_gather(b.ref_ok),
            mode=pad_gather(b.mode, 1),
            filter_flag=pad_gather(b.filter_flag),
            strong_allowed=pad_gather(b.strong_allowed),
            inter=pad_gather(b.inter),
        )
    pp._stacked_cache = (n_steps, out)
    return n_steps, out


@functools.partial(jax.jit, static_argnames=("sizes", "c_idx", "shape"))
def _run_plane(stacked, residuals, sizes: tuple, c_idx: int, shape: tuple,
               pred_plane=None):
    """stacked: dict log2 -> dict of [n_steps, cap, ...]; residuals: dict
    log2 -> [n_steps, cap, s, s].  Returns the reconstructed plane."""
    ph, pw = shape
    plane = jnp.zeros((ph + GUARD, pw), jnp.int32)
    if pred_plane is None:
        pred_plane = jnp.zeros((1, 1), jnp.int32)
    pred_pad = jnp.zeros((ph + GUARD, pw), jnp.int32)
    pred_pad = pred_pad.at[:pred_plane.shape[0], :pred_plane.shape[1]].set(
        pred_plane[:ph, :pw])

    def body(plane, step_data):
        pred_fn = (predict_batch_mxu if USE_MXU_INTRA else predict_batch)
        for log2 in sizes:
            d = step_data[log2]
            plane = pred_fn.__wrapped__(
                plane, d["pos"], d["ref_ys"], d["ref_xs"], d["ref_ok"],
                d["mode"], d["filter_flag"], d["strong_allowed"],
                d["residual"], 1 << log2, c_idx,
                inter=d["inter"], pred_plane=pred_pad)
        return plane, None

    scan_in = {log2: dict(stacked[log2], residual=residuals[log2])
               for log2 in sizes}
    plane, _ = jax.lax.scan(body, plane, scan_in)
    return plane[:ph]


def reconstruct_tpu_scan(tplan: TensorPlan, use_mxu: bool = True):
    """Stage B via one scan per plane; returns [y, cb, cr] np planes."""
    outs = []
    for pp in tplan.planes:
        if not pp.batches:
            outs.append(np.zeros(pp.shape, np.int32))
            continue
        n_steps, stacked = _stack_plane(pp)
        residuals = {}
        for log2, b in pp.batches.items():
            res = _residual_for(b, log2, use_mxu)
            res = jnp.concatenate(
                [res, jnp.zeros((1,) + res.shape[1:], res.dtype)])
            residuals[log2] = res[jnp.asarray(stacked[log2]["idx_map"])]
        dev_stacked = {
            log2: {k: jnp.asarray(v) for k, v in d.items() if k != "idx_map"}
            for log2, d in stacked.items()}
        sizes = tuple(sorted(pp.batches.keys()))
        pred = (None if pp.inter_pred is None
                else jnp.asarray(pp.inter_pred))
        plane = _run_plane(dev_stacked, residuals, sizes,
                           min(pp.plane_idx, 1), pp.shape, pred)
        outs.append(plane)
    return [np.asarray(p) for p in outs]


# ---------------------------------------------------------------------------
# frame-batched execution: frames are folded into one tall plane buffer
# (per-frame segments of height H+GUARD) so the single-frame compiled scan is
# reused with larger step batches -- no vmap, no extra compilation shapes.
# Independent intra frames / streams are data-parallel (SURVEY.md 7.4).
# ---------------------------------------------------------------------------


def _merge_tensor_plans(tplans: list, p_idx: int):
    """Merge one plane across F frames into a combined PlanePlan-like view."""
    return _merge_plane_plans([tp.planes[p_idx] for tp in tplans], p_idx)


def _merge_plane_plans(pps_: list, p_idx: int):
    """Fold same-shaped PlanePlans into one tall plane (stride ph+GUARD).
    Used for frame batching and for running cb+cr as a single scan."""
    from p265_tpu.plan.frame_plan import PlanePlan, TuBatch

    ph, pw = pps_[0].shape
    stride = ph + GUARD
    F = len(pps_)
    n_steps = max(pp.n_steps for pp in pps_)
    merged = PlanePlan(p_idx, (stride * F - GUARD, pw), n_steps)
    all_sizes = sorted({log2 for pp in pps_ for log2 in pp.batches})
    for log2 in all_sizes:
        parts = []
        for f, pp in enumerate(pps_):
            b = pp.batches.get(log2)
            if b is None:
                continue
            off = f * stride
            nref2 = b.ref_ys.shape[1]
            pos = b.pos.copy()
            pos[:, 0] += off
            rys = b.ref_ys + off  # invalid refs are gated by ref_ok
            parts.append((b, pos, rys))
        if not parts:
            continue
        order = np.argsort(
            np.concatenate([b.step for b, _, _ in parts]), kind="stable")
        cat = lambda key: np.concatenate(
            [getattr(b, key) for b, _, _ in parts])[order]
        merged.batches[log2] = TuBatch(
            size=1 << log2,
            pos=np.concatenate([p for _, p, _ in parts])[order],
            step=cat("step"),
            coeffs=cat("coeffs"),
            qp=cat("qp"),
            mode=cat("mode"),
            c_idx=cat("c_idx"),
            is_dst=cat("is_dst"),
            tskip=cat("tskip"),
            has_res=cat("has_res"),
            bypass=cat("bypass"),
            scale_m=(None if all(b.scale_m is None for b, _, _ in parts)
                     else np.concatenate(
                         [b.scale_m if b.scale_m is not None
                          else np.full((len(b.step), 1 << log2, 1 << log2),
                                       16, np.int32)
                          for b, _, _ in parts])[order]),
            inter=cat("inter"),
            filter_flag=cat("filter_flag"),
            strong_allowed=cat("strong_allowed"),
            dc_edge=cat("dc_edge"),
            ref_ys=np.concatenate([r for _, _, r in parts])[order],
            ref_xs=cat("ref_xs"),
            ref_ok=cat("ref_ok"),
        )
    preds = None
    if any(pp.inter_pred is not None for pp in pps_):
        preds = np.zeros((stride * F - GUARD, pw), np.int32)
        for f, pp in enumerate(pps_):
            if pp.inter_pred is not None:
                preds[f * stride:f * stride + ph] = pp.inter_pred
    merged.inter_pred = preds
    return merged, stride, ph


def reconstruct_tpu_scan_frames(tplans: list, use_mxu: bool = True):
    """Batched Stage B over F same-resolution frames -> list of [y,cb,cr]."""
    F = len(tplans)
    if F == 1:
        return [reconstruct_tpu_scan(tplans[0], use_mxu)]
    outs_per_frame = [[None] * 3 for _ in range(F)]
    # luma scan over F frames; cb+cr fold into ONE scan over 2F segments
    # (identical quadtree geometry, same c_idx=1 kernel) -- one fewer
    # sequential scan per batch
    groups = [[tp.planes[0] for tp in tplans],
              [tp.planes[1] for tp in tplans] + [tp.planes[2] for tp in tplans]]
    for gi, pps_ in enumerate(groups):
        merged, stride, ph = _merge_plane_plans(pps_, gi)
        segs = [(f % F, 1 + f // F if gi else 0) for f in range(len(pps_))]
        if not merged.batches:
            for f, p_idx in segs:
                outs_per_frame[f][p_idx] = np.zeros((ph, merged.shape[1]),
                                                    np.int32)
            continue
        # the merged "plane" already contains per-frame guard segments; the
        # plain scan adds one more guard at the very bottom (harmless)
        plane = reconstruct_tpu_scan_plane(merged, use_mxu)
        for i, (f, p_idx) in enumerate(segs):
            outs_per_frame[f][p_idx] = plane[i * stride:i * stride + ph]
    return outs_per_frame


def reconstruct_tpu_scan_plane(pp, use_mxu: bool = True):
    """Run the scan for a single PlanePlan; returns the np plane [shape]."""
    n_steps, stacked = _stack_plane(pp)
    residuals = {}
    for log2, b in pp.batches.items():
        res = _residual_for(b, log2, use_mxu)
        res = jnp.concatenate(
            [res, jnp.zeros((1,) + res.shape[1:], res.dtype)])
        residuals[log2] = res[jnp.asarray(stacked[log2]["idx_map"])]
    dev_stacked = {
        log2: {k: jnp.asarray(v) for k, v in d.items() if k != "idx_map"}
        for log2, d in stacked.items()}
    sizes = tuple(sorted(pp.batches.keys()))
    pred = (None if pp.inter_pred is None else jnp.asarray(pp.inter_pred))
    plane = _run_plane(dev_stacked, residuals, sizes,
                       min(pp.plane_idx, 1), pp.shape, pred)
    return np.asarray(plane)
