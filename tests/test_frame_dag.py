"""Frame-DAG batch scheduling (SURVEY.md 2.3 'frame parallel'; VERDICT r4
ask #8): mutually independent inter pictures (hierarchical-B siblings)
share one Stage-B dispatch on the batch axis, bit-exact vs golden and vs
the unbatched path."""
import numpy as np

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.async_decoder import PipelinedTpuDecoder
from p265_tpu.pipeline.decoder import TpuDecoder, plan_frame_groups
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence


def _ra_stream(n=8, seed=11, w=192, h=128):
    sps = SPS(pic_width=w, pic_height=h, temporal_mvp_enabled=True)
    pps = PPS(init_qp=32, sign_data_hiding=True)
    frames = make_moving_sequence(w, h, n, seed=seed)
    s, _ = Encoder(sps, pps, qp=32, seed=seed).encode_sequence(frames, "RA")
    return s


def test_group_planner_structure():
    """Groups preserve decode order and never contain a frame whose DPB
    reference set includes another member."""
    s = _ra_stream()
    captured = []

    class Spy(TpuDecoder):
        def _drain_recon(self, stop_deferring=False):
            q = self._recon_queue or []
            captured.extend(plan_frame_groups(q, 4))
            super()._drain_recon(stop_deferring)

    Spy(frame_dag_max=4).decode_stream(s)
    assert any(len(g) >= 2 for g in captured), "no sibling group formed"
    for g in captured:
        pocs = {t["frame"].poc for t in g}
        for t in g:
            assert not (pocs - {t["frame"].poc}) & set(t["refs"]), \
                ("group member references another member", pocs)


def test_ra_batched_bit_exact_sync_and_pipelined():
    s = _ra_stream()
    gold = GoldenDecoder().decode_stream(s)
    for cls in (TpuDecoder, PipelinedTpuDecoder):
        d = cls(frame_dag_max=4)
        out = d.decode_stream(s)
        assert d.stats.get("dag_batched", 0) >= 2, cls.__name__
        assert len(out) == len(gold)
        for f, g in zip(out, gold):
            for c in range(3):
                assert np.array_equal(np.asarray(f.planes[c]),
                                      g.planes[c]), (cls.__name__, f.poc, c)


def test_batched_equals_unbatched():
    """frame_dag_max=1 (batching off) and =4 produce identical pixels."""
    s = _ra_stream(seed=13)
    a = TpuDecoder(frame_dag_max=1)
    outs_a = a.decode_stream(s)
    assert "dag_batched" not in a.stats
    b = TpuDecoder(frame_dag_max=4)
    outs_b = b.decode_stream(s)
    assert b.stats.get("dag_batched", 0) >= 2
    for fa, fb in zip(outs_a, outs_b):
        for c in range(3):
            assert np.array_equal(np.asarray(fa.planes[c]),
                                  np.asarray(fb.planes[c])), (fa.poc, c)
