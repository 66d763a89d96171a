"""Benchmark harness: prints ONE JSON line for the driver.

Metric (round 1): config-1 416x240 intra Stage-B throughput -- device
reconstruction (dequant + IDCT/DST + 35-mode intra wavefront + deblock + SAO)
in frames/s on one chip, frame-batched (frame-parallel decode is the
production configuration for intra streams / multi-stream serving), verified
bit-exact against the golden decoder before timing.  vs_baseline is the
speedup over the golden scalar NumPy recon+filters (stand-in for the
reference pure-Python decoder, which publishes no numbers and is orders of
magnitude slower still -- see BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCH = 4


def main():
    from p265_tpu.golden import recon as grecon
    from p265_tpu.golden.decoder import GoldenDecoder, apply_loop_filters
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.kernels.loopfilter import loop_filters_tpu_frames
    from p265_tpu.pipeline.wavefront import reconstruct_tpu_scan_frames
    from p265_tpu.plan.frame_plan import build_tensor_plan
    from p265_tpu.testgen.encoder import IntraEncoder, make_test_image

    w, h, qp = 416, 240, 32
    golds, tplans = [], []
    for seed in range(BATCH):
        sps = SPS(pic_width=w, pic_height=h)
        pps = PPS(init_qp=qp, sign_data_hiding=True)
        img = make_test_image(w, h, seed + 3)
        stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed + 3).encode_frame(img)
        g = GoldenDecoder().decode_stream(stream)[0]
        golds.append(g)
        tplans.append(build_tensor_plan(g.plan))

    plans = [g.plan for g in golds]

    def decode_batch():
        outs = reconstruct_tpu_scan_frames(tplans)
        return loop_filters_tpu_frames(plans, outs)

    # correctness gate: every frame bit-exact vs golden
    results = decode_batch()
    for g, pre, filt in zip(golds, reconstruct_tpu_scan_frames(tplans), results):
        for c in range(3):
            assert np.array_equal(pre[c], g.prefilter[c]), "prefilter mismatch"
            assert np.array_equal(filt[c], g.planes[c]), "filtered mismatch"

    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = decode_batch()
    np.asarray(out[-1][0])
    dt = (time.perf_counter() - t0) / (n_iter * BATCH)
    fps = 1.0 / dt

    t0 = time.perf_counter()
    gp = grecon.reconstruct(golds[0].plan)
    apply_loop_filters(golds[0].plan, gp)
    golden_dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "416x240 intra stage-B frames/s/chip (bit-exact, batch=4)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(golden_dt / dt, 2),
    }))


if __name__ == "__main__":
    main()
