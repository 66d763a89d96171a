"""Time COMPILATION of the P-frame fused program's stages at 1080p."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["P265_TPU_COMPILE_CACHE"] = "off"

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


from tools.make_streams import get_stream
from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.plan.frame_plan import build_tensor_plan
from p265_tpu.pipeline.wavefront import ShapePolicy
from p265_tpu.pipeline.batch_decode import (_build_batch, _decode_batch_jit,
                                            _freeze, _thaw)

data = get_stream("s1080_ldp4")
gold = GoldenDecoder().decode_stream(data)
pol = ShapePolicy()
for g in gold:
    tp = build_tensor_plan(g.plan, skip_pred=True)
    pol.observe(tp, n_refs=3)
g = gold[1]
prof = pol.profile(1)
tp = build_tensor_plan(g.plan, skip_pred=True)
refs = {gold[0].poc: gold[0].planes}
from p265_tpu.kernels.mc import mc_arrays_padded, mc_block_counts
cnt = mc_block_counts(g.plan)
poc_list = sorted(refs)
mc_in = mc_arrays_padded(g.plan, {p: i for i, p in enumerate(poc_list)},
                         {k: prof.mc_rows(k, n) for k, n in cnt.items()})
n_refs = prof.refs_cap(len(poc_list))
pics = [refs[p] for p in poc_list]
while len(pics) < n_refs:
    pics.append(pics[0])
refs_in = tuple(tuple(jnp.asarray(np.asarray(p[c], np.uint8)) for p in pics)
                for c in range(3))
bufs, meta = _build_batch([tp], [g.plan], policy=prof, mc=mc_in)
dbufs = tuple(jnp.asarray(b) for b in bufs)
jax.block_until_ready(dbufs)
log("built inputs")

which = sys.argv[1:] or ["scan", "mc", "itu", "filters", "full"]


def compile_variant(label, mutate):
    m = _thaw(meta)
    mutate(m)
    mt = _freeze(m)
    t0 = time.perf_counter()
    _decode_batch_jit.lower(dbufs, mt, True,
                            refs=refs_in).compile()
    log(f"compile {label:14s} {time.perf_counter() - t0:8.1f} s")


if "scan" in which:
    compile_variant("scan only", lambda m: m.update(
        mc=None, itu=None, deblock=False, sao_luma=False, sao_chroma=False))
if "mc" in which:
    compile_variant("scan+mc", lambda m: m.update(
        itu=None, deblock=False, sao_luma=False, sao_chroma=False))
if "itu" in which:
    compile_variant("scan+itu", lambda m: m.update(
        mc=None, deblock=False, sao_luma=False, sao_chroma=False))
if "filters" in which:
    compile_variant("scan+filters", lambda m: m.update(mc=None, itu=None))
if "full" in which:
    compile_variant("full", lambda m: None)
