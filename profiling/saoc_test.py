"""Compile-time test for _sao_apply at one (H, W, ctb): prints seconds."""
import sys
import time

import numpy as np
import jax.numpy as jnp

from p265_tpu.kernels.loopfilter import _sao_apply

H, W, ctb = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rng = np.random.default_rng(0)
ny, nx = (H * 2 + 63) // 64, (W * 2 + 63) // 64
plane = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.int32))
ty = jnp.asarray(rng.integers(0, 3, (ny, nx), dtype=np.int32))
cls = jnp.asarray(rng.integers(0, 4, (ny, nx), dtype=np.int32))
offs = jnp.asarray(rng.integers(-3, 4, (4, ny, nx), dtype=np.int32))
t0 = time.perf_counter()
out = _sao_apply(plane, ty, cls, offs, ctb)
out.block_until_ready()
print(f"H={H} W={W} ctb={ctb}: {time.perf_counter()-t0:.2f}s", flush=True)
