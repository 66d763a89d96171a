"""Scaling lists: default and explicitly signaled matrices (spec 7.3.4, 8.6.3)."""
import numpy as np
import pytest

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import (PPS, SPS, ScalingListData,
                                 default_scaling_list,
                                 parse_scaling_list_data,
                                 resolve_scaling_matrices,
                                 write_scaling_list_data)
from p265_tpu.hls.bitio import BitReader, BitWriter
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import IntraEncoder, make_test_image


def _custom_sld(seed=0):
    rng = np.random.default_rng(seed)
    sld = ScalingListData()
    for size_id in range(4):
        for mid in range(2 if size_id == 3 else 6):
            base = default_scaling_list(size_id, mid)
            jit = rng.integers(-3, 4, size=len(base))
            sld.lists[(size_id, mid)] = np.clip(base + jit, 1, 255).astype(np.int32)
            if size_id > 1:
                sld.dc[(size_id, mid)] = int(rng.integers(10, 24))
    return sld


def test_scaling_list_data_roundtrip():
    sld = _custom_sld(3)
    w = BitWriter()
    write_scaling_list_data(w, sld)
    w.rbsp_trailing_bits()
    got = parse_scaling_list_data(BitReader(w.get_bytes()))
    for k in sld.lists:
        assert np.array_equal(got.lists[k], sld.lists[k]), k
    for k in sld.dc:
        assert got.dc[k] == sld.dc[k], k


def test_resolve_matrices_shapes():
    m = resolve_scaling_matrices(None)  # defaults
    assert m[(2, 0)].shape == (4, 4) and (m[(2, 0)] == 16).all()
    assert m[(3, 0)].shape == (8, 8) and m[(3, 0)][7, 7] == 115
    assert m[(4, 1)].shape == (16, 16) and m[(4, 1)][0, 0] == 16
    assert m[(5, 1)].shape == (32, 32)


@pytest.mark.parametrize("custom", [False, True])
def test_scaling_lists_e2e(custom):
    sld = _custom_sld(1) if custom else None
    sps = SPS(pic_width=96, pic_height=64, scaling_list_enabled=True,
              scaling_list_data=sld)
    pps = PPS(init_qp=30, transform_skip_enabled=True)
    img = make_test_image(96, 64, 5)
    stream, plan, rec = IntraEncoder(sps, pps, qp=30, seed=5).encode_frame(img)
    g = GoldenDecoder().decode_stream(stream)[0]
    assert g.plan.scaling is not None
    for c in range(3):
        assert np.array_equal(g.prefilter[c], rec[c])
    t = TpuDecoder().decode_stream(stream)[0]
    for c in range(3):
        assert np.array_equal(t.planes[c], g.planes[c])
