"""Multi-process DP decode (jax.distributed, SURVEY.md 4.2.4 / config 5):
2 spawned processes join a localhost coordinator, each parses its own
streams, Stage-B runs as ONE global shard_map over the joint mesh, and each
process verifies its shard bit-exact vs the unsharded golden decode.

Runs single-host-multi-process here (CPU devices); the same worker code
runs unmodified on 2 real hosts.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import numpy as np
coord, pid = sys.argv[1], int(sys.argv[2])

import jax
jax.config.update("jax_platforms", "cpu")
from p265_tpu.shard import distributed as D

D.initialize(coord, num_processes=2, process_id=pid, local_devices=2)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.testgen.encoder import IntraEncoder, make_test_image

def make_stream(seed):
    sps = SPS(pic_width=64, pic_height=64)
    pps = PPS(init_qp=33, sign_data_hiding=True)
    img = make_test_image(64, 64, seed)
    s, _, _ = IntraEncoder(sps, pps, qp=33, seed=seed).encode_frame(img)
    return s

# global batch: streams 0..3 over 4 devices; this process owns 2 of them
mine = [make_stream(seed) for seed in (2 * pid, 2 * pid + 1)]
mesh = D.global_mesh()
outs = D.decode_streams_distributed(mine, mesh)
for li, s in enumerate(mine):
    g = GoldenDecoder().decode_stream(s)[0]
    for c in range(3):
        assert np.array_equal(outs[li][c], g.prefilter[c]), (pid, li, c)
print(f"proc {pid}: {len(mine)} streams bit-exact OK", flush=True)
"""


def test_two_process_dp_decode(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    w = tmp_path / "worker.py"
    w.write_text(_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [subprocess.Popen([sys.executable, str(w), addr, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: 2 streams bit-exact OK" in out, out[-3000:]


_WORKER_PROD = r"""
import sys
import numpy as np
coord, pid = sys.argv[1], int(sys.argv[2])

import jax
jax.config.update("jax_platforms", "cpu")
from p265_tpu.shard import distributed as D

D.initialize(coord, num_processes=2, process_id=pid, local_devices=2)
assert jax.process_count() == 2

from p265_tpu.golden.decoder import GoldenDecoder
from p265_tpu.hls.params import PPS, SPS
from p265_tpu.testgen.encoder import Encoder, make_moving_sequence

def ldp_stream(seed):
    sps = SPS(pic_width=192, pic_height=128)
    pps = PPS(init_qp=32, sign_data_hiding=True)
    enc = Encoder(sps, pps, qp=32, seed=seed)
    frames = make_moving_sequence(192, 128, 4, seed=seed)
    s, _ = enc.encode_sequence(frames, "LDP")
    return s

# one logical "feed" of two concatenated LDP GOPs -> 2 IRAP segments,
# plus an independent second stream -> 3 segments over 2 processes
streams = [ldp_stream(7) + ldp_stream(8), ldp_stream(9)]
segs = [D.split_irap_segments(s) for s in streams]
assert [len(x) for x in segs] == [2, 1], [len(x) for x in segs]

my_work, layout = D.schedule_segments(streams, 2, pid)
assert layout == [2, 1]
outs = D.decode_segments_production([w[2] for w in my_work])

# production path actually ran: inter pictures + native parse + filters
for (si, gi, seg), frames in zip(my_work, outs):
    assert len(frames) == 4, (si, gi, len(frames))
    assert any(f.plan.pus for f in frames), "no inter PUs decoded"
    gold = GoldenDecoder().decode_stream(seg)
    for f, g in zip(frames, gold):
        for c in range(3):
            assert np.array_equal(np.asarray(f.planes[c]), g.planes[c]), (
                pid, si, gi, f.poc, c)
print(f"proc {pid}: {len(my_work)} segments production bit-exact OK",
      flush=True)
"""


def test_two_process_production_segments(tmp_path):
    """VERDICT r4 ask #5: >=4-frame inter streams through the production
    TpuDecoder (native parse, fused MC, DPB, filters) on 2 jax.distributed
    processes, IRAP-delimited scheduling, bit-exact vs golden."""
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    w = tmp_path / "worker_prod.py"
    w.write_text(_WORKER_PROD)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [subprocess.Popen([sys.executable, str(w), addr, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "production bit-exact OK" in out, out[-3000:]
