"""One compile per FRAME KIND per stream (SURVEY.md 7.6): the ShapePolicy +
parse-time calibration must make every frame of a stream hit one of at most
two jitted programs -- one for intra pictures (many thin wavefront steps),
one for inter pictures (few fat steps + MC/ITU machinery).  Sharing one
program across kinds was measured to cost ~6x device time at 1080p
(max-steps x max-caps padding).

Counts DISTINCT program signatures (buffer shapes/dtypes + static meta) seen
by the single-dispatch batch jit -- a recompile would show up as a new
signature."""
import numpy as np
import pytest

import p265_tpu.pipeline.batch_decode as bd
from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.pipeline.decoder import TpuDecoder
from p265_tpu.testgen.encoder import Encoder, make_test_image


def _ldp_stream(w=96, h=64, n=4, qp=30, seed=7):
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    frames = [make_test_image(w, h, s) for s in range(n)]
    stream, _ = Encoder(sps, pps, qp=qp, seed=seed).encode_sequence(
        frames, structure="LDP")
    return stream


class _SignatureSpy:
    def __init__(self, monkeypatch):
        self.signatures = set()
        orig = bd._decode_batch_jit

        def spy(bufs, meta, *a, **k):
            self.signatures.add(
                (tuple((b.shape, str(b.dtype)) for b in bufs), meta)
                + tuple(a))
            return orig(bufs, meta, *a, **k)

        monkeypatch.setattr(bd, "_decode_batch_jit", spy)


def _assert_matches_golden(stream, dec):
    gold = GoldenDecoder().decode_stream(stream)
    pics = dec.decode_stream(stream)
    assert len(pics) == len(gold)
    for i, (p, g) in enumerate(zip(pics, gold)):
        for c in range(3):
            assert np.array_equal(p.prefilter[c], g.prefilter[c]), (i, c)
            assert np.array_equal(p.planes[c], g.planes[c]), (i, c)


def test_one_compile_per_stream(monkeypatch):
    spy = _SignatureSpy(monkeypatch)
    _assert_matches_golden(_ldp_stream(), TpuDecoder())
    assert len(spy.signatures) == 2, (   # one intra + one inter program
        f"{len(spy.signatures)} distinct programs for one LDP stream")


def test_one_compile_pipelined(monkeypatch):
    from p265_tpu.pipeline.async_decoder import PipelinedTpuDecoder
    spy = _SignatureSpy(monkeypatch)
    _assert_matches_golden(_ldp_stream(seed=9), PipelinedTpuDecoder())
    assert len(spy.signatures) == 2      # one intra + one inter program


def test_calibration_window_overflow(monkeypatch):
    # frames past the calibration window reconstruct immediately; the
    # running-max ladder bounds late recompiles (here: content shrinks or
    # stays level, so NO new program should appear)
    spy = _SignatureSpy(monkeypatch)
    dec = TpuDecoder(calibrate_frames=2)
    _assert_matches_golden(_ldp_stream(n=6, seed=11), dec)
    # two kinds + a few pow2 ladder bumps from frames past the window --
    # bounded by ladder height, never by frame count
    assert len(spy.signatures) <= 5


def test_second_stream_reuses_program(monkeypatch):
    # the SAME stream through a fresh decoder sharing the policy must add
    # zero new programs; a different-content stream may bump a ladder rung
    # at most once (bounded growth, never per-frame)
    from p265_tpu.pipeline.wavefront import ShapePolicy
    policy = ShapePolicy()
    spy = _SignatureSpy(monkeypatch)
    _assert_matches_golden(_ldp_stream(seed=7),
                           TpuDecoder(shape_policy=policy))
    n1 = len(spy.signatures)
    assert n1 == 2                       # intra + inter program
    _assert_matches_golden(_ldp_stream(seed=7),
                           TpuDecoder(shape_policy=policy))
    assert len(spy.signatures) == 2
    _assert_matches_golden(_ldp_stream(seed=13),
                           TpuDecoder(shape_policy=policy))
    assert len(spy.signatures) <= 4


def test_intra_only_stream_still_exact(monkeypatch):
    # all-intra stream: calibration must not force pred planes it never saw
    spy = _SignatureSpy(monkeypatch)
    sps = SPS(pic_width=64, pic_height=64)
    pps = PPS(init_qp=32)
    from p265_tpu.testgen.encoder import IntraEncoder
    img = make_test_image(64, 64, 3)
    stream, _, _ = IntraEncoder(sps, pps, qp=32, seed=3).encode_frame(img)
    _assert_matches_golden(stream, TpuDecoder())
    assert len(spy.signatures) == 1
