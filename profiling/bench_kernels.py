"""Per-kernel throughput: CTU/s for the IDCT and MC device kernels
(BASELINE.json north-star metric names these two).  Prints one JSON line per
kernel; bench.py remains the driver's single-line contract."""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from p265_tpu.kernels.itransform import batch_residual
    from p265_tpu.kernels.mc import _mc_blocks
    from p265_tpu.kernels.pallas_itransform import pallas_batch_residual

    rng = np.random.default_rng(0)
    results = []

    # IDCT: a 64x64 CTU is 256 4x4 / 64 8x8 / 16 16x16 / 4 32x32 TUs.
    for log2, per_ctu in ((2, 256), (3, 64), (4, 16), (5, 4)):
        s = 1 << log2
        n = 2048
        lv = ((rng.random((n, s, s)) < 0.2)
              * rng.integers(-200, 200, (n, s, s))).astype(np.int32)
        qp = rng.integers(20, 45, n).astype(np.int32)
        z = np.zeros(n, bool)
        args = (jnp.asarray(lv), jnp.asarray(qp), jnp.asarray(z),
                jnp.asarray(z), jnp.asarray(z))
        for name, fn in (("xla", lambda: batch_residual(
                              args[0], args[1], args[2], args[3], log2, True,
                              bypass=args[4])),
                         ("pallas", lambda: pallas_batch_residual(
                              args[0], args[1], args[2], args[3], args[4],
                              log2))):
            r = fn()
            np.asarray(r)
            t0 = time.perf_counter()
            for _ in range(20):
                r = fn()
            np.asarray(r)
            dt = (time.perf_counter() - t0) / 20
            ctus = n / per_ctu / dt
            results.append({"kernel": f"idct{s}x{s}-{name}",
                            "ctu_per_s": round(ctus), "tu_per_s": round(n / dt)})

    # MC: 4x4 luma blocks; a 64x64 CTU = 256 blocks.
    H, W = 1088, 1920
    ref = rng.integers(0, 256, (2, H, W)).astype(np.int32)
    n = 4096
    pos = np.stack([rng.integers(0, H - 8, n), rng.integers(0, W - 8, n)],
                   axis=1).astype(np.int32)
    ridx = rng.integers(0, 2, n).astype(np.int32)
    mv = rng.integers(-128, 128, (n, 2)).astype(np.int32)
    from p265_tpu.tables import LUMA_FILTER
    fr = np.stack([LUMA_FILTER[mv[:, 0] & 3], LUMA_FILTER[mv[:, 1] & 3]],
                  axis=1).astype(np.int32)
    args = (jnp.asarray(ref), jnp.asarray(pos), jnp.asarray(ridx),
            jnp.asarray(mv), jnp.asarray(fr))
    r = _mc_blocks(*args, 4, 8, 2)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(20):
        r = _mc_blocks(*args, 4, 8, 2)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / 20
    results.append({"kernel": "mc-luma-8tap", "ctu_per_s": round(n / 256 / dt),
                    "blocks_per_s": round(n / dt)})

    for rec in results:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
