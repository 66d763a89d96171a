"""Synthetic scan-compile scaling probe: which dimension blows up XLA?

Builds fake wavefront-scan inputs with parametric (n_steps, cap, H, W,
buckets) and times jit compile+first-run of the _scan_plane program in
isolation.  Usage:
    python profiling/probe_scan_compile.py n_steps=1504 cap=64 H=2224 W=1920 sizes=2,3,4,5
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def fake_stacked(n_steps, cap, log2, H, W, rng):
    s = 1 << log2
    nref = 2 * (2 * s + 1)
    pos = np.zeros((n_steps, cap, 2), np.int32)
    pos[..., 0] = rng.integers(0, max(H - s, 1), (n_steps, cap))
    pos[..., 1] = rng.integers(0, max(W - s, 1), (n_steps, cap))
    return dict(
        pos=jnp.asarray(pos),
        ref_ys=jnp.asarray(rng.integers(0, H, (n_steps, cap, nref), dtype=np.int32)),
        ref_xs=jnp.asarray(rng.integers(0, W, (n_steps, cap, nref), dtype=np.int32)),
        ref_ok=jnp.asarray(rng.integers(0, 2, (n_steps, cap, nref)).astype(bool)),
        mode=jnp.asarray(rng.integers(0, 35, (n_steps, cap), dtype=np.int32)),
        filter_flag=jnp.asarray(np.zeros((n_steps, cap), bool)),
        strong_allowed=jnp.asarray(np.zeros((n_steps, cap), bool)),
        inter=jnp.asarray(np.zeros((n_steps, cap), bool)),
        dc_edge=jnp.asarray(np.ones((n_steps, cap), bool)),
        residual=jnp.asarray(rng.integers(-64, 64, (n_steps, cap, s, s), dtype=np.int32)),
    )


def main():
    args = dict(kv.split("=") for kv in sys.argv[1:])
    n_steps = int(args.get("n_steps", 1504))
    cap = int(args.get("cap", 64))
    H = int(args.get("H", 2224))
    W = int(args.get("W", 1920))
    sizes = tuple(int(x) for x in args.get("sizes", "2,3,4,5").split(","))
    log("backend", jax.default_backend(), "n_steps", n_steps, "cap", cap,
        "H", H, "W", W, "sizes", sizes)
    rng = np.random.default_rng(0)
    from p265_tpu.pipeline.wavefront import _scan_plane

    stacked = {log2: fake_stacked(n_steps, cap, log2, H, W, rng)
               for log2 in sizes}

    fn = jax.jit(lambda st: _scan_plane(st, sizes, 0, (H, W), None))
    t0 = time.perf_counter()
    lowered = fn.lower(stacked)
    log("lowered", round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log("compiled", round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    out = compiled(stacked)
    out.block_until_ready()
    log("run1", round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    out = compiled(stacked)
    out.block_until_ready()
    log("run2", round(time.perf_counter() - t0, 3))


if __name__ == "__main__":
    main()
