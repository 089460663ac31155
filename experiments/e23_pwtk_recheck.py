"""e23: re-measure pwtk + cant w-SELL SpMV (suite_r6 anomaly check).

suite_r6 recorded pwtk at 683 us / 27.3% of STREAM where suite_r5 and the
round-4 suite both had ~210 us / 88-90% — same matrix (nnz 10556619), same
kernel code (spmv_pallas.py unchanged since r5), same bytes model.  This
either reproduces (real regression -> bisect) or it was a one-off chip/axon
flake during the r6 run.  Prints records; repeats each measurement 3x.
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

for name in ("pwtk", "cant"):
    a = datasets.emulate(name, scale=1.0, dtype=np.float32)
    for rep in range(3):
        rec = bench_lib.bench_spmv(a, method="auto", iters=25)
        d = rec.as_dict()
        print(json.dumps({"matrix": name, "rep": rep,
                          "us": round(d["seconds_per_iter"] * 1e6, 1),
                          "pct_stream": round(d["pct_stream"], 1),
                          "method": d["method"]}), flush=True)
