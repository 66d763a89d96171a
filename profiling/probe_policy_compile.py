"""Measure cold compile + warm decode of the PRODUCTION TpuDecoder program
at 1080p (the round-3 judge measured 580.7 s with the 1.5*pow2 ladder vs
11.4 s with plain pow2 shapes -- this probe validates the pow2-only
ShapePolicy + persistent compile cache fix).

Usage: python profiling/probe_policy_compile.py [stream-name] [--no-cache]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--no-cache" in sys.argv:
    os.environ["P265_TPU_COMPILE_CACHE"] = "off"

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


from tools.make_streams import get_stream

name = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "s1080"
data = get_stream(name)

import jax
log("backend", jax.default_backend())

from p265_tpu.pipeline.decoder import TpuDecoder

dec = TpuDecoder()
t0 = time.perf_counter()
frames = dec.decode_stream(data)
cold = time.perf_counter() - t0
log(f"cold decode_stream ({len(frames)} frames): {cold:.1f} s")
log("stats:", {k: round(v, 3) for k, v in dec.stats.items()
               if isinstance(v, float)})

from p265_tpu.golden.decoder import GoldenDecoder
t0 = time.perf_counter()
gold = GoldenDecoder().decode_stream(data)
log(f"golden decode: {time.perf_counter() - t0:.1f} s")
for f, g in zip(frames, gold):
    for c in range(3):
        assert np.array_equal(np.asarray(f.planes[c]), g.planes[c]), \
            (f.poc, c)
log("bit-exact vs golden: OK")

# warm decodes (new decoder object, same process -> jit cache hot)
for trial in range(3):
    dec2 = TpuDecoder()
    t0 = time.perf_counter()
    frames = dec2.decode_stream(data)
    dt = time.perf_counter() - t0
    log(f"warm decode_stream: {dt:.2f} s = {len(frames)/dt:.2f} fps e2e; "
        "stats:", {k: round(v, 3) for k, v in dec2.stats.items()
                   if isinstance(v, float)})
