"""Two _sao_apply instantiations in one process: luma then chroma shapes."""
import time

import numpy as np
import jax.numpy as jnp

from p265_tpu.kernels.loopfilter import _sao_apply


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


rng = np.random.default_rng(0)
for (H, W, ctb) in ((1080, 1920, 64), (540, 960, 32)):
    ny, nx = 17, 30
    plane = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.int32))
    ty = jnp.asarray(rng.integers(0, 3, (ny, nx), dtype=np.int32))
    cls = jnp.asarray(rng.integers(0, 4, (ny, nx), dtype=np.int32))
    offs = jnp.asarray(rng.integers(-3, 4, (4, ny, nx), dtype=np.int32))
    t0 = time.perf_counter()
    out = _sao_apply(plane, ty, cls, offs, ctb)
    out.block_until_ready()
    log(f"H={H} W={W} ctb={ctb}: {time.perf_counter()-t0:.2f}s")
log("DONE")
