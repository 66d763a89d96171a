"""Pallas wavefront mega-kernel (kernels/pallas_wavefront) bit-exactness.

Runs the kernel in interpret mode (the suite is pinned to the virtual CPU
mesh, conftest.py) against the golden decoder, through the same entry point
production uses (decode_batch(..., pscan=True)).  Covers:

- all TU sizes 4..32 (full mode search encodes mixed quadtrees),
- multi-segment merged-plane geometry (batches > 1 frame, luma+chroma),
- edge CTUs at non-multiple-of-8 picture heights (RMW window clamping),
- the automatic XLA fallback for frames too wide for the 512-lane scratch.

On-chip (Mosaic) validation of the same path lives in tests/test_tpu_smoke.py
and must pass before pipeline/batch_decode.USE_PALLAS_SCAN is enabled
(VERDICT.md round-1 Weak #1).
"""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.batch_decode import decode_batch
from p265_tpu.pipeline.wavefront import pallas_scan_ok, _merge_segments
from p265_tpu.plan.frame_plan import build_tensor_plan
from p265_tpu.testgen.encoder import IntraEncoder, make_test_image


def _mk(seed, w, h, qp=30, **enc_kw):
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    img = make_test_image(w, h, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed,
                                **enc_kw).encode_frame(img)
    return GoldenDecoder().decode_stream(stream)[0]


def _check_pscan(golds):
    tplans = [build_tensor_plan(g.plan) for g in golds]
    pre, filt = decode_batch(tplans, [g.plan for g in golds],
                             pscan=True, interpret=True)
    for g, p3, f3 in zip(golds, pre, filt):
        for c in range(3):
            assert np.array_equal(np.asarray(p3[c]), g.prefilter[c]), c
            assert np.array_equal(np.asarray(f3[c]), g.planes[c]), c


@pytest.mark.parametrize("qp", [12, 30, 45])
def test_pscan_single_frame_qps(qp):
    # QP sweep shifts the TU-size/mode mix; full search hits all 35 modes
    _check_pscan([_mk(11, 128, 64, qp=qp, full_mode_search=True)])


def test_pscan_multi_frame_batch():
    _check_pscan([_mk(s, 128, 64) for s in range(3)])


def test_pscan_nonaligned_dims():
    # 104x56: bottom/right CTUs force splits; 56 is not a multiple of 8+8
    # window, exercising the RMW row-window clamp at the plane bottom
    _check_pscan([_mk(21, 104, 56), _mk(22, 104, 56)])


def test_pscan_config1_416x240():
    _check_pscan([_mk(31, 416, 240, qp=32)])


def test_wide_frame_falls_back_to_xla():
    # 640 > 472: the pallas scratch cannot hold the row; decode_batch with
    # pscan=True must still be bit-exact via the automatic XLA fallback
    # (ADVICE.md round-1 high finding: this used to crash in host packing).
    g = _mk(41, 640, 64)
    tplans = [build_tensor_plan(g.plan)]
    pps_ = [tplans[0].planes[c] for c in range(3)]
    merged, _ = _merge_segments(pps_)
    assert not pallas_scan_ok(merged)
    pre, filt = decode_batch(tplans, [g.plan], pscan=True, interpret=True)
    for c in range(3):
        assert np.array_equal(np.asarray(pre[0][c]), g.prefilter[c]), c
        assert np.array_equal(np.asarray(filt[0][c]), g.planes[c]), c
