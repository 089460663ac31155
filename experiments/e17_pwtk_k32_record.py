"""e17: commit the missing SpMM K=32 record on pwtk (VERDICT r1 item 1).

pwtk K=32 was the one FEM-suite row without a committed record: its Xt
(26 MB) forces the streamed-Xt BSR-T mode, whose 22 per-range Mosaic
compiles looked like a hang to the suite watchdog. With range shapes
unified (one compile serves all ranges) the row is runnable; this script
appends the record to benchmarks/results/suite_r5.jsonl.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from sblas import datasets, bench_lib

OUT = Path(__file__).resolve().parent.parent / (
    "benchmarks/results/suite_r5.jsonl")


def main():
    a = datasets.emulate("pwtk", scale=1.0, dtype=np.float32)
    rec = bench_lib.bench_spmm(a, 32, method="auto", iters=10)
    rec.extra["matrix"] = "pwtk"
    d = rec.as_dict()
    print(json.dumps(d), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(d) + "\n")


if __name__ == "__main__":
    main()
