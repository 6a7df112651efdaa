#!/usr/bin/env python3
"""Round-4 decode-kernel A/B: bulk vs bulk2 vs bulkn=4, mask_arith on/off,
all in ONE session through the hardened batch-slope instrument (bench.py
slope_fit: >=3 batch points, min-of-N reps, monotone-or-reject).

Mosaic's cross-session scheduling variance (BASELINE.md round 2) means
only same-session numbers are comparable — this script exists so the
co-schedule ladder and the mask_arith experiment (VERDICT r3 items 1, 8)
get decided on one compile session's evidence.

Usage: TSQ_BENCH_MB=64 python bench/ab_decode.py
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (the instrument lives there)


def main():
    size_mb = int(os.environ.get("TSQ_BENCH_MB", "64"))
    bench._enable_jax_cache()
    native = bench.ensure_native()
    data = bench.get_corpus(size_mb)

    import jax
    assert jax.devices()[0].platform == "tpu", "needs the TPU tunnel"

    # (mask_arith axis removed: decided round 4 — the arithmetic mask is
    # the only variant; this script now A/Bs just the r3 co-schedule
    # ladder for regression tracking vs bench/ab_gang.py)
    cases = [("bulk", "bulk"), ("bulk2", "bulk2"), ("bulk4", "bulk4")]
    results = []
    for label, kernel in cases:
        t0 = time.time()
        try:
            mbps, resid = bench.bench_tpu_kernel(data, native, kernel)
            results.append((label, mbps, resid))
            print(f"{label}: {mbps:7.1f} MB/s/chip  residual {resid:.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            results.append((label, None, None))
            print(f"{label}: FAILED {e}", flush=True)

    print("\n=== A/B summary (one session) ===")
    for label, mbps, resid in results:
        v = f"{mbps:7.1f}" if mbps else "   FAIL"
        print(f"  {label}: {v} MB/s/chip")


if __name__ == "__main__":
    main()
