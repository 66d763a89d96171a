"""One d2h scenario per process: case in argv[1]."""
import sys, time
import numpy as np
import jax.numpy as jnp
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
case = sys.argv[1]
rng = np.random.default_rng(0)
if case == "h2d_small":      # h2d + add, fetch 0.4MB
    x = jnp.asarray(rng.integers(0, 200, (240, 416), dtype=np.int32))
    y = (x + 1).block_until_ready()
elif case == "arange_04mb":  # no h2d, fetch 0.4MB
    y = (jnp.zeros((240, 416), jnp.int32) + 7).block_until_ready()
elif case == "h2d_tiny":     # h2d + add, fetch 512B
    x = jnp.asarray(rng.integers(0, 200, (128,), dtype=np.int32))
    y = (x + 1).block_until_ready()
t0 = time.perf_counter()
h = np.asarray(y)
log(f"{case}: d2h {h.nbytes/1e6:.2f}MB took {time.perf_counter()-t0:.3f}s")
