"""e18: k-resident PSEG SpMM on power-law graphs (round 6).

The committed powerlaw-1M record (suite_r5_large.jsonl) ran SpMM k=8 at
28.1 ms = 8.3x one SpMV: the whole-VMEM executor could only hold kc=1 RHS
plane at m=1M, so the schedule streamed k times.  The k-resident executor
(spmm_pseg._kres) regroups the schedule by (y group, tail-Xt chunk) and
streams it ONCE for all kc<=8 RHS — the output y-group block rides a
per-tile prefetch scalar, tail Xt streams in 256-panel chunks.

This script measures auto (k-resident) vs kres=False (the old kc=1 path)
on powerlaw-1M and appends records to suite_r6_large.jsonl.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from sblas import datasets, bench_lib

OUT = Path(__file__).resolve().parent.parent / (
    "benchmarks/results/suite_r6_large.jsonl")


def main():
    t0 = time.time()
    a = datasets.powerlaw_graph(1_000_000, avg_deg=100, seed=7,
                                dtype=np.float32)
    print(f"# gen {time.time() - t0:.1f}s nnz={a.nnz}", flush=True)
    for k in (8, 32):
        rec = bench_lib.bench_spmm(a, k, method="auto", iters=5)
        rec.extra["matrix"] = "powerlaw-1M-100M"
        d = rec.as_dict()
        print(json.dumps(d), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(d) + "\n")


if __name__ == "__main__":
    main()
