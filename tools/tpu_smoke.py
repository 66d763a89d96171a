"""On-hardware smoke qualifier: every accelerator-default decode path must be
bit-exact on the REAL backend before any perf claim (VERDICT.md round-1
Weak #1/#3: interpret-mode bit-exactness does not transfer to Mosaic).

Usage:
  python tools/tpu_smoke.py            # run all paths, each in a subprocess
                                       # (a Mosaic SIGABRT only kills that
                                       # path's process, not the qualifier)
  python tools/tpu_smoke.py <path>     # run one path in-process; exit 0 iff
                                       # bit-exact.  paths: xla_intra,
                                       # inter_mc, filters_device

The driver bench (bench.py) runs its own bit-exactness gate before timing;
this script is the wider qualifier for optional kernels such as the fused
Pallas residual path (kernels/itransform.USE_PALLAS_RESIDUAL).
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _mk_intra(seed, w=416, h=240, qp=32):
    from p265_tpu.golden.decoder import GoldenDecoder
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.testgen.encoder import IntraEncoder, make_test_image
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    img = make_test_image(w, h, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed).encode_frame(img)
    return GoldenDecoder().decode_stream(stream)[0]


def _check_batch() -> None:
    from p265_tpu.pipeline.batch_decode import decode_batch
    from p265_tpu.plan.frame_plan import build_tensor_plan
    golds = [_mk_intra(s) for s in range(2)]
    tplans = [build_tensor_plan(g.plan) for g in golds]
    pre, filt = decode_batch(tplans, [g.plan for g in golds])
    for g, p3, f3 in zip(golds, pre, filt):
        for c in range(3):
            assert np.array_equal(np.asarray(p3[c]), g.prefilter[c]), c
            assert np.array_equal(np.asarray(f3[c]), g.planes[c]), c


def path_presid():
    """Fused Pallas dequant+IDCT in the production program (TPU backend
    routes 8x8+ residual batches through kernels/pallas_itransform)."""
    from p265_tpu.kernels import itransform as IT
    assert IT.USE_PALLAS_RESIDUAL
    _check_batch()


def path_xla_intra():
    """416x240 intra batch, XLA scan + MXU intra + device filters."""
    _check_batch()



def path_inter_mc():
    """Short RA B-GOP through TpuDecoder: device MC + scan + device filters."""
    from p265_tpu.golden.decoder import GoldenDecoder
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.pipeline.decoder import TpuDecoder
    from p265_tpu.testgen.encoder import Encoder, make_moving_sequence
    w, h = 192, 128
    sps = SPS(pic_width=w, pic_height=h, temporal_mvp_enabled=True,
              num_reorder_pics=2, max_dec_pic_buffering=5)
    pps = PPS(init_qp=30, sign_data_hiding=True)
    frames = make_moving_sequence(w, h, 5, seed=9)
    stream, _ = Encoder(sps, pps, qp=30, seed=9).encode_sequence(
        frames, structure="RA")
    gold = GoldenDecoder().decode_stream(stream)
    got = TpuDecoder().decode_stream(stream)
    assert len(got) == len(gold)
    for gf, tf in zip(gold, got):
        for c in range(3):
            assert np.array_equal(np.asarray(tf.planes[c]), gf.planes[c]), c


PATHS = {
    "presid": path_presid,
    "xla_intra": path_xla_intra,
    "inter_mc": path_inter_mc,
}


def main(argv) -> int:
    if len(argv) == 2:
        name = argv[1]
        import jax
        backend = jax.default_backend()
        PATHS[name]()
        print(f"[tpu_smoke] {name}: bit-exact on backend={backend}")
        return 0
    ok = True
    results = {}
    for name in PATHS:
        r = subprocess.run([sys.executable, __file__, name], timeout=1200,
                           capture_output=True, text=True)
        passed = r.returncode == 0
        results[name] = "PASS" if passed else f"FAIL rc={r.returncode}"
        if passed:
            print(r.stdout.strip())
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-12:]
            print(f"[tpu_smoke] {name}: FAILED rc={r.returncode}")
            print("\n".join("    " + ln for ln in tail))
            ok = False
    print("[tpu_smoke] summary:", results)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
