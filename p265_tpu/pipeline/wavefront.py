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
from p265_tpu.kernels.itransform import batch_residual
from p265_tpu.plan.frame_plan import PlanePlan, TensorPlan

GUARD = 32


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
        for log2 in sizes:
            d = step_data[log2]
            plane = predict_batch.__wrapped__(
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
            res = batch_residual(
                jnp.asarray(b.coeffs), jnp.asarray(b.qp),
                jnp.asarray(b.is_dst), jnp.asarray(b.tskip), log2, use_mxu)
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
# frame-batched execution: vmap the per-plane scan over a batch of frames
# (intra frames / independent streams are data-parallel; SURVEY.md 7.4)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("sizes", "c_idx", "shape"))
def _run_plane_batch(stacked, residuals, sizes: tuple, c_idx: int,
                     shape: tuple, pred_planes):
    def one(st, res, pred):
        return _run_plane.__wrapped__(st, res, sizes, c_idx, shape, pred)
    return jax.vmap(one)(stacked, residuals, pred_planes)


def reconstruct_tpu_scan_frames(tplans: list, use_mxu: bool = True):
    """Batched Stage B over F same-resolution frames -> list of [y,cb,cr]."""
    F = len(tplans)
    outs_per_frame = [[None] * 3 for _ in range(F)]
    for p_idx in range(3):
        pps_ = [tp.planes[p_idx] for tp in tplans]
        shape = pps_[0].shape
        all_sizes = sorted({log2 for pp in pps_ for log2 in pp.batches})
        if not all_sizes:
            for f in range(F):
                outs_per_frame[f][p_idx] = np.zeros(shape, np.int32)
            continue
        stacked_f = []
        res_f = []
        n_steps_max = 0
        caps = {}
        per_frame = []
        for pp in pps_:
            n_steps, st = _stack_plane(pp)
            n_steps_max = max(n_steps_max, n_steps)
            per_frame.append((pp, n_steps, st))
            for log2 in all_sizes:
                if log2 in st:
                    caps[log2] = max(caps.get(log2, 8), st[log2]["pos"].shape[1])
        for log2 in all_sizes:
            caps.setdefault(log2, 8)
        ph, pw = shape
        for pp, n_steps, st in per_frame:
            frame_st = {}
            frame_res = {}
            for log2 in all_sizes:
                size = 1 << log2
                cap = caps[log2]
                nref2 = 2 * (2 * size + 1)
                if log2 in st:
                    d = st[log2]
                    n_s, c0 = d["pos"].shape[0], d["pos"].shape[1]
                else:
                    d = None
                    n_s, c0 = 0, 0

                def grow(a, fill, tail_shape):
                    out = np.full((n_steps_max, cap) + tail_shape, fill,
                                  a.dtype if a is not None else np.int32)
                    if a is not None:
                        out[:a.shape[0], :a.shape[1]] = a
                    return out

                pos = grow(d["pos"] if d else None, 0, (2,))
                # pads (grown region) scatter into the guard area
                if d is not None:
                    mask = np.zeros((n_steps_max, cap), bool)
                    mask[:n_s, :c0] = True
                else:
                    mask = np.zeros((n_steps_max, cap), bool)
                pos[~mask] = (ph, 0)
                frame_st[log2] = dict(
                    pos=pos,
                    ref_ys=grow(d["ref_ys"] if d else None, 0, (nref2,)),
                    ref_xs=grow(d["ref_xs"] if d else None, 0, (nref2,)),
                    ref_ok=grow(np.asarray(d["ref_ok"], bool) if d else None,
                                False, (nref2,)).astype(bool),
                    mode=grow(d["mode"] if d else None, 1, ()),
                    filter_flag=grow(np.asarray(d["filter_flag"], bool) if d
                                     else None, False, ()).astype(bool),
                    strong_allowed=grow(np.asarray(d["strong_allowed"], bool)
                                        if d else None, False, ()).astype(bool),
                    inter=grow(np.asarray(d["inter"], bool) if d else None,
                               False, ()).astype(bool),
                )
                # residual [n_steps_max, cap, s, s]
                res = np.zeros((n_steps_max, cap, size, size), np.int32)
                if log2 in pp.batches and d is not None:
                    b = pp.batches[log2]
                    r = np.asarray(batch_residual(
                        jnp.asarray(b.coeffs), jnp.asarray(b.qp),
                        jnp.asarray(b.is_dst), jnp.asarray(b.tskip), log2,
                        use_mxu))
                    rp = np.concatenate(
                        [r, np.zeros((1,) + r.shape[1:], r.dtype)])
                    res[:n_s, :c0] = rp[d["idx_map"]]
                frame_res[log2] = res
            pred = (pp.inter_pred if pp.inter_pred is not None
                    else np.zeros((1, 1), np.int32))
            # normalize pred shape across frames
            pfull = np.zeros(shape, np.int32)
            pfull[:pred.shape[0], :pred.shape[1]] = pred[:ph, :pw]
            stacked_f.append(frame_st)
            res_f.append(frame_res)
        stack = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *stacked_f)
        resid = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *res_f)
        preds = jnp.asarray(np.stack(
            [np.zeros(shape, np.int32) if pp.inter_pred is None else
             pp.inter_pred for pp, *_ in per_frame]))
        planes = _run_plane_batch(stack, resid, tuple(all_sizes),
                                  min(p_idx, 1), shape, preds)
        planes = np.asarray(planes)
        for f in range(F):
            outs_per_frame[f][p_idx] = planes[f]
    return outs_per_frame
