"""Spatially sharded Stage-B == unsharded, bit-exact (SURVEY.md §2.3 halo
row, §5 determinism gate): row-sharded wavefront recon with per-step ppermute
halos, sharded-DPB MC via all_gather, halo deblock + SAO."""
import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.plan.frame_plan import build_tensor_plan
from p265_tpu.shard.spatial import (decode_picture_spatial, deblock_spatial,
                                    loop_filters_spatial, mc_spatial,
                                    reconstruct_spatial)
from p265_tpu.testgen.encoder import (Encoder, IntraEncoder, make_test_image,
                                      make_moving_sequence)


def _mesh1d(n, name="space"):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), (name,))


def _intra_frame(w=64, h=128, ctb_log2=5, qp=32, seed=11):
    sps = SPS(pic_width=w, pic_height=h, log2_ctb_size=ctb_log2)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    img = make_test_image(w, h, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed).encode_frame(img)
    return GoldenDecoder().decode_stream(stream)[0]


def _ldp_frames(w=64, h=128, n=3, ctb_log2=5, qp=32, seed=7):
    sps = SPS(pic_width=w, pic_height=h, log2_ctb_size=ctb_log2)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    frames = make_moving_sequence(w, h, n, seed=seed)
    enc = Encoder(sps, pps, qp=qp, seed=seed)
    stream, _ = enc.encode_sequence(frames, "LDP")
    return GoldenDecoder().decode_stream(stream)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_recon_spatial_intra_bit_exact(n_dev):
    g = _intra_frame()
    mesh = _mesh1d(n_dev)
    tplan = build_tensor_plan(g.plan)
    out = reconstruct_spatial(tplan, mesh)
    for c in range(3):
        assert np.array_equal(out[c], g.prefilter[c]), c


def test_recon_spatial_8dev():
    g = _intra_frame(w=64, h=256)
    mesh = _mesh1d(8)
    out = reconstruct_spatial(build_tensor_plan(g.plan), mesh)
    for c in range(3):
        assert np.array_equal(out[c], g.prefilter[c]), c


def test_filters_spatial_bit_exact():
    g = _intra_frame(w=64, h=128, qp=37)
    mesh = _mesh1d(4)
    filt = loop_filters_spatial(g.plan, g.prefilter, mesh)
    for c in range(3):
        assert np.array_equal(filt[c], g.planes[c]), c


def test_deblock_spatial_bit_exact():
    from p265_tpu.kernels.loopfilter import deblock_tpu
    g = _intra_frame(w=64, h=128, qp=40, seed=3)
    mesh = _mesh1d(4)
    sharded = deblock_spatial(g.plan, g.prefilter, mesh)
    ref = deblock_tpu(g.plan, [np.asarray(p, np.int32) for p in g.prefilter])
    for c in range(3):
        assert np.array_equal(sharded[c], np.asarray(ref[c])), c


def test_inter_spatial_full_picture():
    """P frames (inter PUs + occasional intra CUs): sharded-DPB MC via
    all_gather + row-sharded mixed recon + halo filters == golden."""
    outs = _ldp_frames()
    mesh = _mesh1d(4)
    for i in range(1, len(outs)):
        refs = {outs[i - 1].poc: outs[i - 1].planes}
        pre, filt = decode_picture_spatial(outs[i].plan, refs, mesh)
        for c in range(3):
            assert np.array_equal(pre[c], outs[i].prefilter[c]), (i, c, "pre")
            assert np.array_equal(filt[c], outs[i].planes[c]), (i, c, "filt")


def test_mc_spatial_matches_device_mc():
    from p265_tpu.kernels.mc import build_inter_pred_device
    outs = _ldp_frames(seed=13)
    mesh = _mesh1d(4)
    g = outs[1]
    refs = {outs[0].poc: outs[0].planes}
    sharded = mc_spatial(g.plan, refs, mesh)
    ref = build_inter_pred_device(g.plan, refs)
    for c in range(3):
        assert np.array_equal(sharded[c], ref[c]), c


# ---------------------------------------------------------------------------
# non-CTU-aligned geometries (VERDICT r3 weak #5): the pad-and-slice row-block
# path must be bit-exact exactly where it was written for -- 1080 rows (not a
# multiple of 32-CTU rows, and 1080/4 devices = 270 rows, not CTU-aligned)
# and odd heights.
# ---------------------------------------------------------------------------


def test_recon_spatial_1080_rows():
    g = _intra_frame(w=64, h=1080, qp=37)
    mesh = _mesh1d(4)
    out = reconstruct_spatial(build_tensor_plan(g.plan), mesh)
    for c in range(3):
        assert np.array_equal(out[c], g.prefilter[c]), c


def test_filters_spatial_1080_rows():
    g = _intra_frame(w=64, h=1080, qp=37)
    mesh = _mesh1d(4)
    filt = loop_filters_spatial(g.plan, g.prefilter, mesh)
    for c in range(3):
        assert np.array_equal(filt[c], g.planes[c]), c


def test_inter_spatial_odd_height():
    """104 = 3*32 + 8: row blocks pad, MC reads edge-replicated ref rows."""
    outs = _ldp_frames(w=64, h=104)
    mesh = _mesh1d(4)
    for i in range(1, len(outs)):
        refs = {outs[i - 1].poc: outs[i - 1].planes}
        pre, filt = decode_picture_spatial(outs[i].plan, refs, mesh)
        for c in range(3):
            assert np.array_equal(pre[c], outs[i].prefilter[c]), (i, c, "pre")
            assert np.array_equal(filt[c], outs[i].planes[c]), (i, c, "filt")


def test_recon_spatial_odd_height_8dev():
    g = _intra_frame(w=64, h=104, qp=34)
    mesh = _mesh1d(8)
    out = reconstruct_spatial(build_tensor_plan(g.plan), mesh)
    for c in range(3):
        assert np.array_equal(out[c], g.prefilter[c]), c
