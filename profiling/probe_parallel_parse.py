"""Measure tile-parallel Stage-A vs sequential on a 1080p 8-tile stream
(VERDICT r4 ask #4 'Done' criterion: measured wall-clock ratio)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from tools.make_streams import get_stream
from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.syntax.ctu import CtuCoder

data = get_stream(sys.argv[1] if len(sys.argv) > 1 else "s1080_t8")


class ParseOnly(GoldenDecoder):
    """Stage-A only: skip reconstruction entirely."""
    def __init__(self):
        super().__init__(use_native_parse=True)

    def _run_recon(self, task):
        task["frame"].planes = task["frame"].prefilter = [None] * 3
        task["pic"].planes = [np.zeros((2, 2), np.int32)] * 3


def run(label, parallel):
    orig = CtuCoder._tiles_parallel_ok
    if not parallel:
        CtuCoder._tiles_parallel_ok = lambda self, n: False
    try:
        best = 1e9
        for _ in range(5):
            d = ParseOnly()
            t0 = time.perf_counter()
            d.decode_stream(data)
            best = min(best, time.perf_counter() - t0)
    finally:
        CtuCoder._tiles_parallel_ok = orig
    print(f"{label:28s} {best*1e3:8.1f} ms", flush=True)
    return best


seq = run("Stage-A sequential", False)
par = run("Stage-A tile-parallel (8)", True)
print(f"speedup: {seq / par:.2f}x")
