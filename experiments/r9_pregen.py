"""Pre-generate the large-suite matrices into the matrix cache.

Host-CPU-only (JAX_PLATFORMS=cpu belt-and-braces; generation is numpy):
runs concurrently with the on-chip mid suite so the --large --web pass
pays ~0 gen seconds (VERDICT r2 item 3). Keys match run_suite.run_large.
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from sblas import datasets
from sblas.plan_cache import cached_matrix

CASES = [
    ("fem-band-1M-112M", lambda: datasets.random_csr(
        1_000_000, 1_000_000, 112, bandwidth=1500, seed=7,
        dtype=np.float32)),
    ("powerlaw-1M-102M", lambda: datasets.powerlaw_graph(
        1_000_000, avg_deg=120, seed=7, dtype=np.float32)),
    ("fem-cluster-1M-109M", lambda: datasets.random_csr(
        1_000_000, 1_000_000, 130, bandwidth=180, seed=11,
        dtype=np.float32)),
    ("uk-2002-full", lambda: datasets.emulate(
        "uk-2002", scale=1.0, dtype=np.float32)),
]

for name, gen in CASES:
    t0 = time.time()
    a = cached_matrix(f"suite-large-{name}", gen)
    print(f"{name}: nnz={a.nnz} in {time.time()-t0:.1f}s", flush=True)
    del a
print("pregen done", flush=True)
