"""e37: why does fem-cluster's plan cache pay nothing? (VERDICT r4 item 7:
suite_r10_large shows warm pack 24.95 s >= cold 23.23 s on fem-cluster,
while fem-band pays 167 -> 70 s.)

Hypothesis: run_large's "cold" SpmvPlan was already a DISK-cache hit —
warm_caches.py / prior rounds left wsell-k201b7ba... (917 MB) in
~/.cache/sblas — so both suite timings measure the same mmap-load + H2D
device-put path, and cache hit/miss only moves the small residual.

Method: wrap plan_cache.cached_arrays with a timer that records whether
each lookup hit disk and how long build/load took, then construct
SpmvPlan(auto) three ways:

  A. disk entry DELETED        -> true cold  (host pack + store + H2D)
  B. disk entry present        -> true warm  (mmap load + H2D)
  C. warm again                -> repeat-warm (page-cache warm)

plan_total - cache_time = H2D device_put + plan overhead, the uncacheable
part. Run on TPU. Appends JSON lines to e37_results.jsonl. Stage A removes
and rebuilds the cache entry (byte-identical rebuild: same digest+params).
"""
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import sblas.plan_cache as pc
from sblas import datasets
from sblas.ops.spmv import SpmvPlan

OUT = Path(__file__).parent / "e37_results.jsonl"

CASES = [
    ("fem-cluster-1M-109M", lambda: datasets.random_csr(
        1_000_000, 1_000_000, 130, bandwidth=180, seed=11,
        dtype=np.float32)),
]

_cache_log = []
_orig = pc.cached_arrays


def _timed_cached_arrays(a, kind, params, build, cache_dir=None):
    t0 = time.time()
    # replicate the hit test so we can record it (key calc is cheap)
    out = _orig(a, kind, params, build, cache_dir)
    _cache_log.append({"kind": kind, "seconds": round(time.time() - t0, 2),
                       "mmap": bool(getattr(
                           next(iter(out.values())), "base", None) is not None
                           or isinstance(next(iter(out.values())),
                                         np.memmap))})
    return out


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    pc.cached_arrays = _timed_cached_arrays
    # retile modules bind the name at import time? no — they call
    # plan_cache.cached_arrays via module attr in retile_wsell (checked:
    # `plan_cache.cached_arrays(...)`), so the patch takes effect.
    cache_root = Path(pc._DEFAULT_DIR)
    for name, gen in CASES:
        a = pc.cached_matrix(f"suite-large-{name}", gen)
        prefix = f"wsell-{pc.matrix_digest(a)}"
        entries = [p.name for p in cache_root.glob(f"{prefix}-*")]
        print(f"{name}: deleting wsell entries {entries}", flush=True)
        for e in entries:
            shutil.rmtree(cache_root / e)
        stages = []
        for label in ("A-true-cold", "B-true-warm", "C-repeat-warm"):
            _cache_log.clear()
            t0 = time.time()
            p = SpmvPlan(a, "auto")
            total = time.time() - t0
            cache_s = sum(r["seconds"] for r in _cache_log)
            stages.append({"stage": label, "plan_total_s": round(total, 2),
                           "cache_layer_s": round(cache_s, 2),
                           "h2d_plus_overhead_s": round(total - cache_s, 2),
                           "method": p.method,
                           "cache_calls": list(_cache_log)})
            del p
        emit({"exp": "e37", "matrix": name, "stages": stages})


if __name__ == "__main__":
    main()
