"""Time the very first d2h in a fresh process, then the second."""
import time
import numpy as np
import jax.numpy as jnp
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
x = (jnp.arange(128, dtype=jnp.int32) + 1).block_until_ready()
log("device op done")
t0 = time.perf_counter()
h = np.asarray(x)
log(f"first d2h (512B): {time.perf_counter()-t0:.3f}s")
y = (jnp.zeros((1080, 1920), jnp.int32) + 7).block_until_ready()
t0 = time.perf_counter()
h2 = np.asarray(y)
log(f"second d2h (8MB): {time.perf_counter()-t0:.3f}s")
