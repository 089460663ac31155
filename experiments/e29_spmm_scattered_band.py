"""e29: SpMM k=8 method shootout on the scattered-band regime.

The committed fem-band-1M-112M SpMM record (suite_r8_large) runs the
blocked w-SELL SpMM at 33.4 ms / 7.8% of STREAM — the kernel issues k
gathers + k tiny MXU dots + k*wgroup RMW slabs per window group, so it is
issue-bound at ~10x the byte model (same diagnosis as e13 on cant: 57 GB/s).
bsr_pallas_t cannot rescue it: random-in-band columns at bandwidth 1500
give 128x128 panel density 0.035 < the 0.04 cutoff.

This experiment measures, on the real chip at 100K rows (~11M nnz, same
random-in-band structure, whole-VMEM modes so packs stay cheap), the three
surviving executors:

  pallas       w-SELL SpMM (the current auto winner there)
  spmv_passes  k SpMV passes over one w-SELL SpmvPlan (schedule x8)
  pseg         packed-segment SpMM (kres: one schedule pass, k<=8 in lanes)

plus w-SELL SpMV alone for the per-pass reference. Output: one JSON line
per method -> e29_results.jsonl. The winner sets the auto-chain order for
the scattered-band regime (ops/spmm.py _pick / chain position).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sblas import datasets  # noqa: E402
from sblas import bench_lib  # noqa: E402

OUT = Path(__file__).parent / "e29_results.jsonl"


def main():
    a = datasets.random_csr(100_000, 100_000, 112, bandwidth=1500, seed=7,
                            dtype=np.float32)
    print(f"# matrix 100K x 100K, nnz={a.nnz}", flush=True)
    recs = []

    rec = bench_lib.bench_spmv(a, method="pallas", iters=25)
    rec.extra["matrix"] = "band1500-100K"
    recs.append(rec.as_dict())
    print(json.dumps(recs[-1]), flush=True)

    for method in ("pallas", "spmv_passes", "pseg"):
        try:
            rec = bench_lib.bench_spmm(a, 8, method=method, iters=10)
            rec.extra["matrix"] = "band1500-100K"
            recs.append(rec.as_dict())
            print(json.dumps(recs[-1]), flush=True)
        except Exception as e:
            print(f"# {method} FAIL: {str(e)[:300]}", flush=True)

    with open(OUT, "a") as f:
        for r in recs:
            f.write(json.dumps({"e": "e29", "ts": int(time.time()), **r})
                    + "\n")


if __name__ == "__main__":
    main()
