"""Generate (and cache) the benchmark bitstreams under /tmp.

Deterministic: every stream is a pure function of (name) -- testgen encoder
with fixed seeds -- so any session can regenerate the exact bytes.  Cached by
content name at /tmp/p265_streams/<name>.265 because the pure-Python encoder
is slow at 1080p.

Usage: python tools/make_streams.py [name ...]      (default: all)
Names: s1080 (1080p intra), s1080_ldp4 (1080p 4-frame low-delay P),
       s1080_ra8 (1080p 8-frame random-access), s416_ldp4, s832_ldp4,
       s4k (3840x2160 intra).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

STREAM_DIR = "/tmp/p265_streams"


def _enc(w, h, qp=32, **kw):
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.testgen.encoder import Encoder
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True)
    return Encoder(sps, pps, qp=qp, **kw), sps, pps


def _intra(w, h, seed=3, qp=32, **pps_kw):
    from p265_tpu.hls.params import PPS, SPS
    from p265_tpu.testgen.encoder import IntraEncoder, make_test_image
    sps = SPS(pic_width=w, pic_height=h)
    pps = PPS(init_qp=qp, sign_data_hiding=True, **pps_kw)
    img = make_test_image(w, h, seed)
    stream, _, _ = IntraEncoder(sps, pps, qp=qp, seed=seed).encode_frame(img)
    return stream


def _gop(w, h, n, structure, seed=5, qp=32):
    from p265_tpu.testgen.encoder import make_moving_sequence
    enc, sps, pps = _enc(w, h, qp=qp, seed=seed)
    frames = make_moving_sequence(w, h, n, seed=seed)
    stream, _ = enc.encode_sequence(frames, structure)
    return stream


GENERATORS = {
    "s1080": lambda: _intra(1920, 1080),
    "s1080_ldp4": lambda: _gop(1920, 1080, 4, "LDP"),
    "s1080_ldp16": lambda: _gop(1920, 1080, 16, "LDP"),
    "s1080_ra8": lambda: _gop(1920, 1080, 8, "RA"),
    "s416_ldp4": lambda: _gop(416, 240, 4, "LDP"),
    "s832_ldp4": lambda: _gop(832, 480, 4, "LDP"),
    "s4k": lambda: _intra(3840, 2160),
    "s1080_t8": lambda: _intra(1920, 1080, tiles_enabled=True,
                               num_tile_columns=4, num_tile_rows=2),
    "s1080_t8w": lambda: _intra(1920, 1080, tiles_enabled=True,
                                num_tile_columns=4, num_tile_rows=2,
                                entropy_coding_sync_enabled=True),
}


def stream_path(name: str) -> str:
    return os.path.join(STREAM_DIR, name + ".265")


def get_stream(name: str) -> bytes:
    """Load the named stream, generating + caching it if absent."""
    p = stream_path(name)
    if os.path.exists(p):
        with open(p, "rb") as f:
            return f.read()
    os.makedirs(STREAM_DIR, exist_ok=True)
    t0 = time.perf_counter()
    data = GENERATORS[name]()
    tmp = p + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, p)
    print(f"[make_streams] {name}: {len(data)} bytes in "
          f"{time.perf_counter() - t0:.1f}s -> {p}", flush=True)
    return data


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    names = sys.argv[1:] or list(GENERATORS)
    for name in names:
        get_stream(name)
