"""Diagnose the first-execution wall (VERDICT r4 missing #2).

In a fresh process with a HOT disk compile cache, the first 1080p fetch
pays 316-798 s.  Hypothesis: the axon PJRT plugin's persistent-cache entry
(~400 KB) holds only the optimized HLO, not the TPU executable, so the
SERVER-side backend compile runs lazily at first execution -- the wall
should therefore match the clean-cache compile cost, program by program.

This probe decodes the 4-frame 1080p LDP stream with per-frame timing of
dispatch (client compile) vs first-element fetch (forces execution) vs
full fetch (d2h proper), separating the intra program (frame 0) from the
P program (frames 1-3).
"""
import sys
import time

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from p265_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    log("backend:", jax.default_backend())

    # tunnel warm-up: tiny program, first dispatch + fetch in this process
    t0 = time.perf_counter()
    x = jnp.arange(256, dtype=jnp.int32) + 1
    t1 = time.perf_counter()
    v = np.asarray(x[:1])
    t2 = time.perf_counter()
    log(f"tiny: dispatch {t1-t0:.2f}s first-fetch {t2-t1:.2f}s")

    from tools.make_streams import get_stream
    from p265_tpu.pipeline.decoder import TpuDecoder

    data = get_stream("s1080_ldp4")
    dec = TpuDecoder()   # same config as bench.py (deferred calibration)

    import p265_tpu.pipeline.batch_decode as bd
    orig = bd._decode_batch_jit

    def timed(bufs, meta, use_mxu=True, refs=None):
        t0 = time.perf_counter()
        out = orig(bufs, meta, use_mxu, refs=refs)
        t1 = time.perf_counter()
        # force execution with a 1-element fetch of the last output
        np.asarray(out[2][0, :1, :1])
        t2 = time.perf_counter()
        log(f"  program: dispatch(client-compile) {t1-t0:.2f}s "
            f"exec(first-elem fetch) {t2-t1:.2f}s")
        return out

    bd._decode_batch_jit = timed
    t0 = time.perf_counter()
    frames = dec.decode_stream(data)
    log(f"decode_stream total {time.perf_counter()-t0:.1f}s; stats:",
        {k: round(v, 2) for k, v in dec.stats.items()
         if isinstance(v, float)})
    t0 = time.perf_counter()
    for f in frames:
        for c in range(3):
            np.asarray(f.planes[c])
    log(f"full materialize {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    sys.exit(main())
