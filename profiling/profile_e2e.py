"""Break down the batched Stage-B pipeline: scans vs residuals vs filters."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.kernels.loopfilter import loop_filters_tpu_frames
from p265_tpu.pipeline import wavefront as WF
from p265_tpu.plan.frame_plan import build_tensor_plan
from p265_tpu.testgen.encoder import IntraEncoder, make_test_image

W, H, QP, BATCH = 416, 240, 32, 4


def timed(fn, n=5):
    out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    if isinstance(out, (list, tuple)):
        for o in np.asarray(out[-1], dtype=object).flatten() \
                if False else out:
            pass
    t1 = time.perf_counter()
    return (t1 - t0) / n


def main():
    print("backend:", jax.default_backend())
    golds, tplans = [], []
    for seed in range(BATCH):
        sps = SPS(pic_width=W, pic_height=H)
        pps = PPS(init_qp=QP, sign_data_hiding=True)
        img = make_test_image(W, H, seed + 3)
        stream, _, _ = IntraEncoder(sps, pps, qp=QP, seed=seed + 3)\
            .encode_frame(img)
        g = GoldenDecoder().decode_stream(stream)[0]
        golds.append(g)
        tplans.append(build_tensor_plan(g.plan))
    plans = [g.plan for g in golds]

    # warm
    outs = WF.reconstruct_tpu_scan_frames(tplans)
    filt = loop_filters_tpu_frames(plans, outs)

    def t_recon():
        o = WF.reconstruct_tpu_scan_frames(tplans)
        np.asarray(o[-1][0])
        return o

    def t_filters():
        f = loop_filters_tpu_frames(plans, outs)
        np.asarray(f[-1][0])
        return f

    def t_all():
        o = WF.reconstruct_tpu_scan_frames(tplans)
        f = loop_filters_tpu_frames(plans, o)
        np.asarray(f[-1][0])
        return f

    tr = timed(t_recon)
    tf = timed(t_filters)
    ta = timed(t_all)
    print(f"recon(scan) = {tr*1000:.1f} ms  filters = {tf*1000:.1f} ms  "
          f"all = {ta*1000:.1f} ms  -> {BATCH/ta:.2f} fps")

    # luma vs chroma scan split
    groups = [[tp.planes[0] for tp in tplans],
              [tp.planes[1] for tp in tplans] + [tp.planes[2] for tp in tplans]]
    for gi, pps_ in enumerate(groups):
        merged, stride, ph = WF._merge_plane_plans(pps_, gi)
        n_steps, stacked = WF._stack_plane(merged)
        caps = {1 << l: stacked[l]["pos"].shape[1] for l in stacked}
        tp_ = timed(lambda m=merged: WF.reconstruct_tpu_scan_plane(m), n=3)
        print(f"group {gi}: n_steps={n_steps} caps={caps} "
              f"scan={tp_*1000:.1f} ms")

        # residual-only time (host gather + device)
        def t_res(m=merged):
            n_steps2, stacked2 = WF._stack_plane(m)
            outs = []
            for log2, b in m.batches.items():
                res = WF._residual_for(b, log2, True)
                res = jnp.concatenate(
                    [res, jnp.zeros((1,) + res.shape[1:], res.dtype)])
                outs.append(res[jnp.asarray(stacked2[log2]["idx_map"])])
            jax.block_until_ready(outs)
            return outs
        trs = timed(t_res, n=3)
        print(f"  residual+gather = {trs*1000:.1f} ms")


if __name__ == "__main__":
    main()
