"""Bisect the 1080p loop-filter compile hang, kernel by kernel.

Each kernel compiles in its own subprocess under a timeout, on synthetic
1080p-shaped data.  Usage:
    python profiling/probe_filters.py            # run all stages
    python profiling/probe_filters.py <stage>    # one stage, in-process
Stages: dbl (deblock luma V), dblh (transposed), dbc (chroma), sao, saoc.
"""
import os
import subprocess
import sys
import time

STAGES = ("dbl", "dblh", "dbc", "sao", "saoc")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def run_stage(stage: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from p265_tpu.kernels.loopfilter import (
        _deblock_chroma_vertical, _deblock_luma_vertical, _sao_apply)
    log("backend", jax.default_backend(), "stage", stage)
    rng = np.random.default_rng(0)
    H, W = 1080, 1920
    Hc, Wc = H // 2, W // 2
    t0 = time.perf_counter()
    if stage == "dbl":
        plane = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.int32))
        n_e = W // 8 - 1
        bs = jnp.asarray(rng.integers(0, 3, (H // 4, n_e), dtype=np.int32))
        beta = jnp.asarray(np.full((H // 4, n_e), 64, np.int32))
        tc = jnp.asarray(np.full((H // 4, n_e), 8, np.int32))
        out = _deblock_luma_vertical(plane, bs, beta, tc)
    elif stage == "dblh":
        plane = jnp.asarray(rng.integers(0, 256, (W, H), dtype=np.int32))
        n_e = H // 8 - 1
        bs = jnp.asarray(rng.integers(0, 3, (W // 4, n_e), dtype=np.int32))
        beta = jnp.asarray(np.full((W // 4, n_e), 64, np.int32))
        tc = jnp.asarray(np.full((W // 4, n_e), 8, np.int32))
        out = _deblock_luma_vertical(plane, bs, beta, tc)
    elif stage == "dbc":
        plane = jnp.asarray(rng.integers(0, 256, (Hc, Wc), dtype=np.int32))
        n_e = Wc // 8 - 1
        tc = jnp.asarray(np.full((Hc // 4, n_e), 4, np.int32))
        out = _deblock_chroma_vertical(plane, tc)
    elif stage == "sao":
        plane = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.int32))
        ny, nx = (H + 63) // 64, (W + 63) // 64
        ty = jnp.asarray(rng.integers(0, 3, (ny, nx), dtype=np.int32))
        cls = jnp.asarray(rng.integers(0, 4, (ny, nx), dtype=np.int32))
        offs = jnp.asarray(rng.integers(-3, 4, (4, ny, nx), dtype=np.int32))
        out = _sao_apply(plane, ty, cls, offs, 64)
    elif stage == "saoc":
        plane = jnp.asarray(rng.integers(0, 256, (Hc, Wc), dtype=np.int32))
        ny, nx = (H + 63) // 64, (W + 63) // 64
        ty = jnp.asarray(rng.integers(0, 3, (ny, nx), dtype=np.int32))
        cls = jnp.asarray(rng.integers(0, 4, (ny, nx), dtype=np.int32))
        offs = jnp.asarray(rng.integers(-3, 4, (4, ny, nx), dtype=np.int32))
        out = _sao_apply(plane, ty, cls, offs, 32)
    else:
        raise SystemExit(f"unknown stage {stage}")
    out.block_until_ready()
    log(stage, "compile+run", round(time.perf_counter() - t0, 2))


def main():
    if len(sys.argv) > 1:
        run_stage(sys.argv[1])
        return
    env = dict(os.environ)
    for stage in STAGES:
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, __file__, stage], env=env,
            capture_output=True, text=True, timeout=None if False else 300)
        dt = round(time.perf_counter() - t0, 1)
        tail = (p.stdout + p.stderr).strip().splitlines()
        log(stage, "rc", p.returncode, dt, "s |", tail[-1] if tail else "")


if __name__ == "__main__":
    main()
