"""Bisect the P-frame fused program's device time at 1080p: MC plane vs
hoisted inter-TU apply vs wavefront scan vs filters."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


from tools.make_streams import get_stream
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.pipeline.batch_decode import (_build_batch, _decode_batch_jit,
                                            _freeze, _thaw)

name = sys.argv[1] if len(sys.argv) > 1 else "s1080_ldp4"
data = get_stream(name)

dec = TpuDecoder()
frames = dec.decode_stream(data)          # warm-up + policy calibration
log("warm-up decode done")

dec2 = TpuDecoder()
tasks = []
orig = dec2._run_recon
captured = {}


def spy(task):
    orig(task)
    if task["plan"].pus and "bufs" not in captured:
        # rebuild this P-frame's program inputs exactly as _run_recon did
        pol = dec2.shape_policy
        plan = task["plan"]
        refs = {p: r.planes for p, r in task["refs"].items()}
        tplan = dec2._build_tplan(plan, skip_pred=True)
        from p265_tpu.kernels.mc import mc_arrays_padded, mc_block_counts
        cnt = mc_block_counts(plan)
        poc_list = sorted(refs)
        mc_in = mc_arrays_padded(
            plan, {p: i for i, p in enumerate(poc_list)},
            {k: pol.mc_rows(k, n) for k, n in cnt.items()})
        refs_in = dec2._ref_stacks(refs, poc_list,
                                   pol.refs_cap(len(poc_list)))
        bufs, meta = _build_batch([tplan], [plan], policy=pol, mc=mc_in)
        captured.update(bufs=bufs, meta=meta, refs=refs_in)


dec2._run_recon = spy
dec2.decode_stream(data)
bufs, meta, refs = captured["bufs"], captured["meta"], captured["refs"]
m0 = _thaw(meta)
log("captured P-frame program; mc buckets:",
    [(g, b) for fr in m0["mc"] for g, b, _ in fr], "bi", m0["mc_bi"])

dbufs = tuple(jnp.asarray(b) for b in bufs)
jax.block_until_ready(dbufs)


def run(label, mutate):
    m = _thaw(meta)
    mutate(m)
    mt = _freeze(m)
    out = _decode_batch_jit(dbufs, mt, True, refs=(refs,))
    np.asarray(out[0][:1, :1, :1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = _decode_batch_jit(dbufs, mt, True, refs=(refs,))
        np.asarray(out[0][:1, :1, :1])
        best = min(best, time.perf_counter() - t0)
    log(f"{label:24s} {best*1e3:8.0f} ms")


run("full", lambda m: None)
run("no filters", lambda m: m.update(deblock=False, sao_luma=False,
                                     sao_chroma=False))
run("no mc (dense path off)", lambda m: m.update(mc=None))
run("no itu", lambda m: m.update(itu=None))
run("no mc, no itu", lambda m: m.update(mc=None, itu=None))
run("no mc/itu/filters", lambda m: m.update(mc=None, itu=None, deblock=False,
                                            sao_luma=False,
                                            sao_chroma=False))
