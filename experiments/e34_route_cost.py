"""e34: scale-aware SpMM route pick — calibration + validation (VERDICT r3
item 2).

The r9 suite committed powerlaw-1M-102M SpMM rows on kres-PSEG at 1.65x
(K=8) / 1.89x (K=32) its own k-SpMV-passes bound, silently. Both bytes
models exist at plan time; this experiment backs the router threshold:

  measured (suite_r9/_large rows, bytes backed out of gbps*seconds):
    matrix               bytes_ratio   time_ratio (kres / k-passes)
    uk-2002@0.05  k8/32     0.205        0.70 / 0.78   (kres wins)
    twitter7@0.02 k8/32     0.175        0.66 / 0.67   (kres wins)
    powerlaw-1M   k8/32     1.000        1.65 / 1.89   (kres LOSES)

  kres wins iff bytes_ratio < rate_ratio (kres effective rate / pseg SpMV
  effective rate). Measured rate ratios: 0.27-0.30 where kres is
  gather-issue-bound (mid graphs), 0.61 where it is DMA-bound (powerlaw).
  _KRES_PASSES_CUT = 0.30 sits at the gather-bound floor: every predicted
  win is real, and the powerlaw loss (ratio 1.0) is rejected by 3.3x.

This script builds auto plans for the three calibration matrices at K=8
and K=32 and records the plan-time decision + bytes ratio per case, so the
crossover stays checkable against the measured rows. Run on TPU (the pseg
route requires the accelerator backend).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sblas import datasets
from sblas.ops.spmm import SpmmPlan, _KRES_PASSES_CUT
from sblas.plan_cache import cached_matrix

OUT = Path(__file__).parent / "e34_results.jsonl"

CASES = [
    ("uk-2002@0.05",
     lambda: datasets.emulate("uk-2002", scale=0.05, dtype=np.float32),
     {8: 0.70, 32: 0.78}),
    ("twitter7@0.02",
     lambda: datasets.emulate("twitter7", scale=0.02, dtype=np.float32),
     {8: 0.66, 32: 0.67}),
    ("powerlaw-1M-102M",
     lambda: cached_matrix(
         "suite-large-powerlaw-1M-102M",
         lambda: datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                         dtype=np.float32)),
     {8: 1.65, 32: 1.89}),
]


def main():
    for name, gen, measured in CASES:
        a = gen()
        for k in (8, 32):
            t0 = time.time()
            p = SpmmPlan(a, "auto", k_hint=k)
            rec = {
                "exp": "e34", "matrix": name, "k": k, "nnz": int(a.nnz),
                "method": p.method, "route_reason": p.route_reason,
                "cut": _KRES_PASSES_CUT,
                "measured_time_ratio_r9": measured[k],
                "plan_seconds": round(time.time() - t0, 2),
            }
            # expected: mid graphs stay on kres (ratio ~0.18-0.21 < 0.30),
            # powerlaw flips to passes (ratio ~1.0 >= 0.30)
            want = "pseg" if measured[k] < 1.0 else "spmv_passes"
            rec["expected"] = want
            rec["ok"] = p.method == want
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
