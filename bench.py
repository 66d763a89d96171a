"""Benchmark harness: prints ONE JSON line for the driver.

Metric: config-1 416x240 intra Stage-B throughput -- device reconstruction
(dequant + IDCT/DST + 35-mode intra wavefront + deblock + SAO) in frames/s on
one chip, frame-batched via the single-dispatch batch decoder (one packed
upload, one jitted program, one fetch of the decoded YUV per batch -- the
production configuration), verified bit-exact against the golden decoder
before timing.  vs_baseline is the speedup over the golden scalar NumPy
recon+filters (stand-in for the reference pure-Python decoder, which
publishes no numbers and is orders of magnitude slower still -- BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCH = 4


def main():
    import jax
    from p265_tpu.golden import recon as grecon
    from p265_tpu.golden.decoder import GoldenDecoder, apply_loop_filters
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.pipeline.batch_decode import decode_batch_planes
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

    def decode_and_fetch():
        pl, pc, fl, fc = decode_batch_planes(tplans, plans)
        return np.asarray(fl), np.asarray(fc), pl, pc

    # correctness gate: every frame bit-exact vs golden
    fl, fc, pl, pc = decode_and_fetch()
    pl, pc = np.asarray(pl), np.asarray(pc)
    for f, g in enumerate(golds):
        assert np.array_equal(pl[f], g.prefilter[0]), "prefilter luma"
        assert np.array_equal(pc[f], g.prefilter[1]), "prefilter cb"
        assert np.array_equal(pc[BATCH + f], g.prefilter[2]), "prefilter cr"
        assert np.array_equal(fl[f], g.planes[0]), "filtered luma"
        assert np.array_equal(fc[f], g.planes[1]), "filtered cb"
        assert np.array_equal(fc[BATCH + f], g.planes[2]), "filtered cr"

    # the axon tunnel adds high, load-dependent latency variance; report the
    # median batch time over several repeats (each includes pack + upload +
    # one dispatch + YUV fetch)
    times = []
    for _ in range(15):
        t0 = time.perf_counter()
        fl, fc, _, _ = decode_and_fetch()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2] / BATCH
    fps = 1.0 / dt

    t0 = time.perf_counter()
    gp = grecon.reconstruct(golds[0].plan)
    apply_loop_filters(golds[0].plan, gp)
    golden_dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"416x240 intra stage-B frames/s/chip (bit-exact, batch={BATCH})",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(golden_dt / dt, 2),
    }))


if __name__ == "__main__":
    main()
