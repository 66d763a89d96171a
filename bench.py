"""Benchmark harness: prints ONE JSON line for the driver.

Metric (BASELINE.json, verbatim denominator): 1080p Main-profile frames/s
per chip, bit-exact -- measured END-TO-END through the production
TpuDecoder (native C Stage-A parse -> policy-stabilized single-dispatch
Stage-B with fused device MC from device-resident DPB slabs -> deblock+SAO)
on a 4-frame 1080p low-delay-P stream with inter pictures (testgen encoder,
deterministic).  The decoded YUV is gated bit-exact against the golden
scalar decoder before timing.  vs_baseline is the speedup over that golden
NumPy decoder on the same stream (stand-in for the reference pure-Python
decoder, which publishes no numbers and is orders of magnitude slower
still -- BASELINE.md).

Cold-path numbers (compile + parse/pack/device split) are printed to stderr
for the record; the driver consumes only the final stdout JSON line.
"""
from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(f"[bench {time.strftime('%H:%M:%S')}]", *a, file=sys.stderr,
          flush=True)


def main():
    import numpy as np

    from tools.make_streams import get_stream
    from p265_tpu.golden.decoder import GoldenDecoder
    from p265_tpu.pipeline.decoder import TpuDecoder

    data = get_stream("s1080_ldp4")   # 1920x1080, IDR + 3 P frames, QP32
    n_frames = 4

    t0 = time.perf_counter()
    gold = GoldenDecoder().decode_stream(data)
    golden_s = time.perf_counter() - t0
    log(f"golden NumPy decode: {golden_s:.1f} s "
        f"({n_frames / golden_s:.3f} fps)")

    # cold decode: compile (persistent-cache assisted) + first stream pass
    t0 = time.perf_counter()
    dec = TpuDecoder()
    frames = dec.decode_stream(data)
    cold_s = time.perf_counter() - t0
    log(f"cold decode: {cold_s:.1f} s; stats:",
        {k: round(v, 3) for k, v in dec.stats.items()
         if isinstance(v, float)})

    # correctness gate: every frame bit-exact vs golden (filtered output)
    assert len(frames) == len(gold) == n_frames
    for f, g in zip(frames, gold):
        for c in range(3):
            assert np.array_equal(np.asarray(f.planes[c]), g.planes[c]), \
                ("bit-exact gate", f.poc, c)
    log("bit-exact gate vs golden: OK")

    # warm: repeated full-stream decodes through fresh decoder objects
    # (jit cache hot; includes parse + pack + upload + device + fetch)
    best = 1e9
    for _ in range(3):
        d = TpuDecoder()
        t0 = time.perf_counter()
        out = d.decode_stream(data)
        for f in out:   # e2e includes materializing every decoded pixel
            for c in range(3):
                np.asarray(f.planes[c])
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"warm decode: {dt:.2f} s; stats:",
            {k: round(v, 3) for k, v in d.stats.items()
             if isinstance(v, float)})
    fps = n_frames / best

    print(json.dumps({
        "metric": "1080p Main-profile frames/s/chip (e2e LDP inter, "
                  "bit-exact)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(golden_s / best, 2),
    }))


if __name__ == "__main__":
    main()
