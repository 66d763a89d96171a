"""Benchmark harness: prints ONE JSON line for the driver.

Metric (round 1): config-1 416x240 intra Stage-B throughput -- device
reconstruction (dequant + IDCT/DST + 35-mode intra wavefront + deblock + SAO)
frames/s on one chip, verified bit-exact against the golden decoder before
timing.  vs_baseline is the speedup over the golden scalar NumPy recon
(the stand-in for the reference pure-Python decoder, which publishes no
numbers and is orders of magnitude slower -- see BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from p265_tpu.golden import recon as grecon
    from p265_tpu.golden.decoder import GoldenDecoder, apply_loop_filters
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.kernels.loopfilter import loop_filters_tpu
    from p265_tpu.pipeline.wavefront import reconstruct_tpu_scan as reconstruct_tpu
    from p265_tpu.plan.frame_plan import build_tensor_plan
    from p265_tpu.testgen.encoder import IntraEncoder, make_test_image

    w, h, qp, seed = 416, 240, 32, 3
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    img = make_test_image(w, h, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed).encode_frame(img)

    gold = GoldenDecoder().decode_stream(stream)[0]
    plan = gold.plan
    tplan = build_tensor_plan(plan)

    # correctness gate: TPU output must equal golden bit-exactly
    pre = reconstruct_tpu(tplan)
    filtered = loop_filters_tpu(plan, pre)
    for c in range(3):
        assert np.array_equal(pre[c], gold.prefilter[c]), f"prefilter {c}"
        assert np.array_equal(filtered[c], gold.planes[c]), f"filtered {c}"

    # steady-state timing (compiles cached by the gate run)
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pre = reconstruct_tpu(tplan)
        out = loop_filters_tpu(plan, pre)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt

    t0 = time.perf_counter()
    gp = grecon.reconstruct(plan)
    apply_loop_filters(plan, gp)
    golden_dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "416x240 intra stage-B frames/s/chip (bit-exact)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(golden_dt / dt, 2),
    }))


if __name__ == "__main__":
    main()
