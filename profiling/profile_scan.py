"""In-scan per-step cost: time lax.scan bodies of increasing complexity."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
import functools

N_STEPS = 240
CAP = 8
PH, PW = 272, 416  # 240+32 guard


def timed(fn, *a, n=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def mk(shape, dtype=jnp.int32, val=0):
    return jnp.full(shape, val, dtype)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    plane0 = mk((PH, PW))

    for s in (4, 16):
        nref = 2 * (2 * s + 1)
        pos = jnp.asarray(
            rng.integers(0, 200, (N_STEPS, CAP, 2)).astype(np.int32))
        ys = jnp.asarray(
            rng.integers(0, PH, (N_STEPS, CAP, nref)).astype(np.int32))
        xs = jnp.asarray(
            rng.integers(0, PW, (N_STEPS, CAP, nref)).astype(np.int32))
        res = mk((N_STEPS, CAP, s, s))

        @jax.jit
        def scan_noop(plane, pos):
            def body(p, x):
                return p + 1, None
            return jax.lax.scan(body, plane, pos)[0]

        @jax.jit
        def scan_gather(plane, ys, xs):
            def body(p, d):
                y, x = d
                g = p[y, x]
                return p + jnp.sum(g), None
            return jax.lax.scan(body, plane, (ys, xs))[0]

        @jax.jit
        def scan_scatter(plane, pos, res):
            def body(p, d):
                po, r = d
                rows = po[:, 0][:, None, None] + jnp.arange(s)[None, :, None]
                cols = po[:, 1][:, None, None] + jnp.arange(s)[None, None, :]
                return p.at[rows, cols].set(r), None
            return jax.lax.scan(body, plane, (pos, res))[0]

        @jax.jit
        def scan_dus(plane, pos, res):
            # sequential per-TU dynamic_update_slice instead of one scatter
            def body(p, d):
                po, r = d
                def tu(i, p):
                    return jax.lax.dynamic_update_slice(
                        p, r[i], (po[i, 0], po[i, 1]))
                return jax.lax.fori_loop(0, CAP, tu, p), None
            return jax.lax.scan(body, plane, (pos, res))[0]

        @jax.jit
        def scan_dslice_gather(plane, pos):
            # per-TU contiguous strip reads via dynamic_slice
            def body(p, po):
                acc = 0
                def tu(i, acc):
                    top = jax.lax.dynamic_slice(p, (po[i, 0], po[i, 1]),
                                                (1, 2 * s + 1))
                    left = jax.lax.dynamic_slice(p, (po[i, 0], po[i, 1]),
                                                 (2 * s + 1, 1))
                    return acc + jnp.sum(top) + jnp.sum(left)
                acc = jax.lax.fori_loop(0, CAP, tu, acc)
                return p + acc, None
            return jax.lax.scan(body, plane, pos)[0]

        t0 = timed(scan_noop, plane0, pos)
        t1 = timed(scan_gather, plane0, ys, xs)
        t2 = timed(scan_scatter, plane0, pos, res)
        t3 = timed(scan_dus, plane0, pos, res)
        t4 = timed(scan_dslice_gather, plane0, pos)
        print(f"s={s}: noop={t0*1e6/N_STEPS:.1f} gather={t1*1e6/N_STEPS:.1f} "
              f"scatter={t2*1e6/N_STEPS:.1f} dus={t3*1e6/N_STEPS:.1f} "
              f"dslice_gather={t4*1e6/N_STEPS:.1f} us/step")


if __name__ == "__main__":
    main()
