"""Pre-pack the r10 large/web suite plans into the persistent plan cache.

Packing is host-side and backend-independent (plan_cache keys on matrix
digest + pack params), so this runs on the CPU backend while the TPU chip
is busy with experiments — the later `run_suite --large --web` chip run
then starts from warm plan cache, which is what VERDICT r3 item 1's
"warm end-to-end <= 120 s" bar is about.

Unlike prepack_r6 this loads matrices through plan_cache.cached_matrix
with run_suite's exact keys (`suite-large-<case>`), so the ~13-min
uk-2002-full generation is paid at most once per round (warm_caches.py
already paid it this round).

Builds, per case, exactly what run_large builds: SpmvPlan(auto) and
SpmmPlan(auto, k_hint=8/32).

Run: python experiments/prepack_r10.py [case-substring]
"""
import gc
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402

from sblas import datasets  # noqa: E402
from sblas.plan_cache import cached_matrix  # noqa: E402
from sblas.ops.spmv import SpmvPlan  # noqa: E402
from sblas.ops.spmm import SpmmPlan  # noqa: E402

# (case, generator, spmv method, spmm method or None)
# Methods are FORCED to the routes the TPU auto-pick takes: on the CPU
# backend both _picks fall back to the XLA heuristic (bucket), which would
# warm the wrong cache entries (first prepack attempt did exactly that).
# powerlaw's SpMM routes to spmv_passes (e34 cost cut), which reuses the
# SpMV pseg pack — nothing extra to warm.
CASES = [
    ("uk-2002-full", lambda: datasets.emulate(
        "uk-2002", scale=1.0, dtype=np.float32), "pseg_big", "pseg"),
    ("powerlaw-1M-102M", lambda: datasets.powerlaw_graph(
        1_000_000, avg_deg=120, seed=7, dtype=np.float32), "pseg", None),
    ("fem-band-1M-112M", lambda: datasets.random_csr(
        1_000_000, 1_000_000, 112, bandwidth=1500, seed=7,
        dtype=np.float32), "pallas", "bsr_pallas_t"),
    ("fem-cluster-1M-109M", lambda: datasets.random_csr(
        1_000_000, 1_000_000, 130, bandwidth=180, seed=11,
        dtype=np.float32), "pallas", "bsr_pallas_t"),
]


def stamp(msg, t0):
    print(f"[{time.time() - t0:8.1f}s] {msg}", flush=True)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    t0 = time.time()
    for name, gen, spmv_m, spmm_m in CASES:
        if only and only not in name:
            continue
        a = cached_matrix(f"suite-large-{name}", gen)
        stamp(f"{name}: matrix nnz={a.nnz}", t0)
        try:
            p = SpmvPlan(a, spmv_m)
            stamp(f"{name}: spmv[{spmv_m}] plan method={p.method}", t0)
            del p
            gc.collect()
        except Exception as e:
            stamp(f"{name}: spmv[{spmv_m}] plan FAIL {str(e)[:200]}", t0)
        for k in () if spmm_m is None else (8, 32):
            try:
                p = SpmmPlan(a, spmm_m, k_hint=k)
                stamp(f"{name}: spmm[{spmm_m}] k={k} plan "
                      f"method={p.method}", t0)
                del p
                gc.collect()
            except Exception as e:
                stamp(f"{name}: spmm[{spmm_m}] k={k} plan FAIL "
                      f"{str(e)[:200]}", t0)
        del a
        gc.collect()


if __name__ == "__main__":
    main()
