"""Ablate predict_batch inside a scan to find the expensive ops."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from p265_tpu.kernels import intra as KI

N_STEPS = 240
CAP = 8
PH, PW = 272, 416


def timed(fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def build_inputs(s):
    rng = np.random.default_rng(0)
    nref = 2 * (2 * s + 1)
    d = dict(
        pos=rng.integers(0, 200, (N_STEPS, CAP, 2)).astype(np.int32),
        ref_ys=rng.integers(0, PH, (N_STEPS, CAP, nref)).astype(np.int32),
        ref_xs=rng.integers(0, PW, (N_STEPS, CAP, nref)).astype(np.int32),
        ref_ok=rng.integers(0, 2, (N_STEPS, CAP, nref)).astype(bool),
        mode=rng.integers(0, 35, (N_STEPS, CAP)).astype(np.int32),
        filter_flag=rng.integers(0, 2, (N_STEPS, CAP)).astype(bool),
        strong_allowed=np.zeros((N_STEPS, CAP), bool),
        inter=np.zeros((N_STEPS, CAP), bool),
        residual=np.zeros((N_STEPS, CAP, s, s), np.int32),
    )
    return {k: jnp.asarray(v) for k, v in d.items()}


def scan_over(body_fn, data):
    @jax.jit
    def run(plane, data):
        def body(p, d):
            return body_fn(p, d), None
        return jax.lax.scan(body, plane, data)[0]
    return run


def main():
    print("backend:", jax.default_backend())
    plane0 = jnp.zeros((PH, PW), jnp.int32)
    pred_pad = jnp.zeros((PH, PW), jnp.int32)

    for s in (4, 8, 16, 32):
        data = build_inputs(s)

        def full(p, d):
            return KI.predict_batch.__wrapped__(
                p, d["pos"], d["ref_ys"], d["ref_xs"], d["ref_ok"],
                d["mode"], d["filter_flag"], d["strong_allowed"],
                d["residual"], s, 0, inter=d["inter"], pred_plane=pred_pad)

        def no_angular(p, d):
            # gather + filter + planar + dc + scatter, no _angular calls
            nref = 2 * s + 1
            refs = jnp.where(d["ref_ok"], p[d["ref_ys"], d["ref_xs"]], 128)
            left, top = refs[:, :nref], refs[:, nref:]
            left, top = KI._filter_refs(left, top, s, d["filter_flag"],
                                        d["strong_allowed"])
            xg = jnp.arange(s, dtype=jnp.int32)[None, None, :]
            yg = jnp.arange(s, dtype=jnp.int32)[None, :, None]
            log2s = int(np.log2(s))
            planar = ((s - 1 - xg) * left[:, 1:s + 1][:, :, None]
                      + (xg + 1) * top[:, s + 1][:, None, None]
                      + (s - 1 - yg) * top[:, 1:s + 1][:, None, :]
                      + (yg + 1) * left[:, s + 1][:, None, None]
                      + s) >> (log2s + 1)
            out = jnp.clip(planar + d["residual"], 0, 255)
            rows = d["pos"][:, 0][:, None, None] + jnp.arange(s)[None, :, None]
            cols = d["pos"][:, 1][:, None, None] + jnp.arange(s)[None, None, :]
            return p.at[rows, cols].set(out)

        def one_angular(p, d):
            nref = 2 * s + 1
            refs = jnp.where(d["ref_ok"], p[d["ref_ys"], d["ref_xs"]], 128)
            left, top = refs[:, :nref], refs[:, nref:]
            angle = jnp.asarray(KI._ANGLE)[d["mode"]]
            inv = jnp.asarray(KI._INV)[d["mode"]]
            pv = KI._angular(top, left, angle, inv, s)
            out = jnp.clip(pv + d["residual"], 0, 255)
            rows = d["pos"][:, 0][:, None, None] + jnp.arange(s)[None, :, None]
            cols = d["pos"][:, 1][:, None, None] + jnp.arange(s)[None, None, :]
            return p.at[rows, cols].set(out)

        tf = timed(scan_over(full, data), plane0, data)
        tn = timed(scan_over(no_angular, data), plane0, data)
        t1 = timed(scan_over(one_angular, data), plane0, data)
        print(f"s={s}: full={tf*1e6/N_STEPS:.1f} no_angular={tn*1e6/N_STEPS:.1f}"
              f" one_angular={t1*1e6/N_STEPS:.1f} us/step")


if __name__ == "__main__":
    main()
