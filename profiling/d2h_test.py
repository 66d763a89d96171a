"""Probe device->host transfer behavior for large planes over the tunnel."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


log("backend", jax.default_backend())
rng = np.random.default_rng(0)

for shape, dt in (((240, 416), np.int32), ((540, 960), np.int32),
                  ((1080, 1920), np.uint8), ((1080, 1920), np.int32),
                  ((2160, 1920), np.int32)):
    x = jnp.asarray(rng.integers(0, 200, shape, dtype=dt))
    y = (x + 1).block_until_ready()
    t0 = time.perf_counter()
    h = np.asarray(y)
    log(f"d2h {shape} {np.dtype(dt).name}: "
        f"{time.perf_counter()-t0:.3f}s ({h.nbytes/1e6:.1f} MB)")
log("DONE")
