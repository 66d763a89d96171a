"""Spatially sharded loop filters: row-block sharding + ppermute halos.

SAO edge-offset reads a 1-pixel neighborhood, so sharding a plane over CTU-row
blocks needs a 1-row halo exchange per neighbor (the codec analogue of
context-parallel halo exchange, SURVEY.md 5).  Output must be bit-exact vs the
unsharded kernel (tests enforce it).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from p265_tpu.kernels.loopfilter import _sao_maps
from p265_tpu.shard.mesh import halo_exchange_rows
from p265_tpu.syntax.ctu import SAO_BAND, SAO_EDGE, FramePlan

_EO = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (-1, 1, 1, -1))


def _sao_local(local, ty, cls, o0, o1, o2, o3, row0, total_h, axis):
    """SAO over a local row block with halo-exchanged neighbors."""
    top, bot = halo_exchange_rows(local, 1, axis)
    ext = jnp.concatenate([top, local, bot], axis=0)   # [hl+2, W]
    hl, W = local.shape
    v = local
    band = v >> 3
    rel = (band - cls) & 31
    d_band = (jnp.where(rel == 0, o0, 0) + jnp.where(rel == 1, o1, 0)
              + jnp.where(rel == 2, o2, 0) + jnp.where(rel == 3, o3, 0))
    gy = row0 + jnp.arange(hl)[:, None]                # global row index
    xx = jnp.arange(W)[None, :]
    d_edges = []
    for (dy0, dx0, dy1, dx1) in _EO:
        n0 = jax.lax.dynamic_slice(
            jnp.roll(ext, -dx0, 1), (1 + dy0, 0), (hl, W))
        n1 = jax.lax.dynamic_slice(
            jnp.roll(ext, -dx1, 1), (1 + dy1, 0), (hl, W))
        valid = ((gy + dy0 >= 0) & (gy + dy0 < total_h)
                 & (xx + dx0 >= 0) & (xx + dx0 < W)
                 & (gy + dy1 >= 0) & (gy + dy1 < total_h)
                 & (xx + dx1 >= 0) & (xx + dx1 < W))
        e = jnp.sign(v - n0) + jnp.sign(v - n1)
        d = (jnp.where(e == -2, o0, 0) + jnp.where(e == -1, o1, 0)
             + jnp.where(e == 1, o2, 0) + jnp.where(e == 2, o3, 0))
        d_edges.append(jnp.where(valid, d, 0))
    d_edge = jnp.where(cls == 0, d_edges[0],
                       jnp.where(cls == 1, d_edges[1],
                                 jnp.where(cls == 2, d_edges[2], d_edges[3])))
    delta = jnp.where(ty == SAO_BAND, d_band,
                      jnp.where(ty == SAO_EDGE, d_edge, 0))
    return jnp.clip(v + delta, 0, 255)


def sao_sharded(plan: FramePlan, planes: list, mesh: Mesh,
                axis: str = "space") -> list:
    """Row-block-sharded SAO across mesh[axis]; bit-exact vs kernels version."""
    n = mesh.shape[axis]
    sh = plan.sh
    outs = []
    for c in range(3):
        enabled = sh.sao_luma if c == 0 else sh.sao_chroma
        plane = np.asarray(planes[c])
        if not enabled:
            outs.append(plane)
            continue
        H, W = plane.shape
        ty_g, cls_g, offs_g = _sao_maps(plan, c)
        ctb = plan.sps.ctb_size if c == 0 else plan.sps.ctb_size >> 1
        hl = -(-H // (n * 8)) * 8      # pad row blocks onto an 8-row grid

        def pad_rows(a):
            if a.shape[0] < n * hl:
                a = np.pad(a, ((0, n * hl - a.shape[0]), (0, 0)))
            return a

        def expand(m):
            e = np.repeat(np.repeat(m, ctb, axis=0), ctb, axis=1)
            return pad_rows(e[:H, :W].astype(np.int32))

        ty, cls = expand(ty_g), expand(cls_g)
        offs = [expand(offs_g[i]) for i in range(4)]
        plane = pad_rows(plane)

        def body(local, tyl, clsl, o0, o1, o2, o3):
            row0 = jax.lax.axis_index(axis) * hl
            return _sao_local(local, tyl, clsl, o0, o1, o2, o3, row0, H, axis)

        spec = P(axis, None)
        fn = jax.shard_map(body, mesh=mesh, in_specs=(spec,) * 7,
                           out_specs=spec, check_vma=False)
        out = jax.jit(fn)(jnp.asarray(plane), jnp.asarray(ty),
                          jnp.asarray(cls), *(jnp.asarray(o) for o in offs))
        outs.append(np.asarray(out)[:H])
    return outs
