#!/usr/bin/env python3
"""Round-4 gang-kernel A/B: the fixed-geometry gang stream
(csrc/tsq_gang.cpp + kernels/decode_gang.py) vs the round-3 entry-granular
bulk2 baseline, one compile session, hardened batch-slope instrument.

Cases: gangN.U = N co-scheduled blocks, U rounds unrolled per loop body.
Usage: TSQ_BENCH_MB=64 TSQ_AB_CASES=gang2,gang4,bulk2 python bench/ab_gang.py
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main():
    size_mb = int(os.environ.get("TSQ_BENCH_MB", "64"))
    cases = os.environ.get(
        "TSQ_AB_CASES", "gang1,gang2,gang4,gang4.1,gang4.4,bulk2").split(",")
    bench._enable_jax_cache()
    native = bench.ensure_native()
    data = bench.get_corpus(size_mb)

    import jax
    assert jax.devices()[0].platform == "tpu", "needs the TPU tunnel"

    results = []
    for kernel in cases:
        t0 = time.time()
        try:
            mbps, resid = bench.bench_tpu_kernel(data, native, kernel)
            results.append((kernel, mbps, resid))
            print(f"{kernel}: {mbps:7.1f} MB/s/chip  residual {resid:.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            results.append((kernel, None, None))
            print(f"{kernel}: FAILED {e}", flush=True)

    print("\n=== gang A/B summary (one session) ===")
    for kernel, mbps, resid in results:
        v = f"{mbps:7.1f}" if mbps else "   FAIL"
        print(f"  {kernel}: {v} MB/s/chip")


if __name__ == "__main__":
    main()
