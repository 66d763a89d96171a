"""Land a gated 4K number despite the flaky axon worker crash.

At 4K program sizes the TPU worker process crashes server-side with
roughly coin-flip probability per process ("UNAVAILABLE: TPU worker
process crashed or restarted ... kernel fault"), independent of which
kernels run (bisected 2026-08-21: full/fused, unfused, deblock-only and
sao-only each both passed and crashed across repeats; 1080p never
crashes).  This wrapper retries profiling/run_config.py s4k in fresh
processes until one completes, recording attempts.
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for i in range(attempts):
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "run_config.py"), "s4k", "2"],
            capture_output=True, text=True)
        out = p.stdout + p.stderr
        sys.stdout.write(out)
        print(f"[retry] attempt {i + 1}/{attempts}: exit {p.returncode} "
              f"in {time.perf_counter() - t0:.0f}s", flush=True)
        if p.returncode == 0:
            return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
