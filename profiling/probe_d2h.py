"""Characterize axon-tunnel d2h: per-fetch fixed cost vs bandwidth, and
whether a second-thread fetch overlaps a main-thread dispatch (VERDICT r4
weak #2: warm 1080p is ~50% d2h fetch at ~4 MB/s effective).

Run AFTER the tunnel is warm (does its own warm-up first).
"""
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def fetch(x):
    t0 = time.perf_counter()
    h = np.asarray(x)
    return time.perf_counter() - t0, h.nbytes


def main():
    # warm up tunnel
    x = jnp.arange(256, dtype=jnp.int32) + 1
    np.asarray(x)
    log("tunnel warm")

    rng = np.random.default_rng(0)
    for shape, dt in [((256,), np.uint8), ((1080, 1920), np.uint8),
                      ((1080, 1920), np.int32), ((2, 540, 960), np.uint8),
                      ((3110400,), np.uint8), ((4, 1080, 1920), np.uint8)]:
        # real device-produced data (constants get folded + cached host-side
        # and fetch in ~0 ms -- measured, misleading)
        seed = jnp.asarray(rng.integers(0, 255, shape).astype(dt))
        ts = []
        for i in range(5):
            # a FRESH array per fetch: jax caches the materialized value on
            # the Array object, so refetching the same one is free
            y = (seed + i).block_until_ready()
            np.asarray(y[..., :1])  # force exec
            dt_s, nb = fetch(y)
            ts.append(dt_s)
        log(f"d2h {nb/1e6:8.2f} MB: min {min(ts)*1e3:7.1f} ms "
            f"med {sorted(ts)[2]*1e3:7.1f} ms "
            f"({nb/1e6/min(ts):6.1f} MB/s)")

    # overlap test: does a fetch on thread B overlap device work dispatched
    # from thread A?  Device work: a chain of big matmuls (~1s device time).
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def chain(m):
        for _ in range(60):
            m = m @ m + m
        return m

    r = chain(a)
    np.asarray(r[:1, :1])  # compiled + warm
    big = (jnp.zeros((4, 1080, 1920), jnp.uint8) + 1).block_until_ready()
    np.asarray(big[..., :1])

    t0 = time.perf_counter()
    r = chain(a)
    np.asarray(r[:1, :1])
    t_work = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(big)
    t_fetch = time.perf_counter() - t0
    log(f"serial: work {t_work:.2f}s + fetch {t_fetch:.2f}s "
        f"= {t_work + t_fetch:.2f}s")

    got = {}

    def do_fetch():
        t0 = time.perf_counter()
        np.asarray(big)
        got["fetch"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    th = threading.Thread(target=do_fetch)
    th.start()
    r = chain(a)
    np.asarray(r[:1, :1])
    got["work"] = time.perf_counter() - t0
    th.join()
    total = time.perf_counter() - t0
    log(f"overlapped: total {total:.2f}s (work-side {got['work']:.2f}s, "
        f"fetch-side {got['fetch']:.2f}s)")
    log("overlap ratio:", round((t_work + t_fetch) / total, 2))


if __name__ == "__main__":
    main()
