"""e34: scale-aware SpMM route pick — calibration + validation (VERDICT r3
item 2; powerlaw row + honest history, VERDICT r4 items 2/3).

History, corrected in round 11. The r9 suite committed powerlaw-1M-102M
SpMM rows at 1.65x (K=8) / 1.89x (K=32) their own k-SpMV-passes bound.
Two different models priced that case across rounds:

  * the WHOLE-VMEM executor model (kc = _k_chunk() = 1 at 1M rows ->
    k full schedule passes) prices bytes_ratio ~1.000 — that is the
    "rejected by 3.3x" figure earlier revisions of this docstring quoted;
  * the round-10 K-RESIDENT regroup model prices bytes_ratio 0.135 and
    routes to kres — but the kres kernel failed Mosaic compile at this
    scale (SMEM: 126048-round range = 1.001 MiB of prefetch scalars vs
    the hard 1.00 MiB capacity, e36), so the committed r9/r10 rows
    actually ran the kc-chunked fallback the FIRST model describes, at
    the first model's cost, wearing the second model's route_reason.

The round-11 `_SMEM_ROUND_CAP` fix (150K -> 112K rounds) makes the kres
kernel compile at 1M rows, so the 0.135 prediction is now testable:
suite_r11_large measures it directly. Calibration (suite_r9 mid-graph
rows, bytes backed out of gbps*seconds):

    matrix               bytes_ratio   time_ratio (kres / k-passes)
    uk-2002@0.05  k8/32     0.205        0.70 / 0.78   (kres wins)
    twitter7@0.02 k8/32     0.175        0.66 / 0.67   (kres wins)

  kres wins iff bytes_ratio < rate_ratio (kres effective rate / pseg SpMV
  effective rate), measured 0.27-0.30 where kres is gather-issue-bound.
  _KRES_PASSES_CUT = 0.30 sits at that floor: every predicted win is real.

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
    # r9/r10's 1.65/1.89x "kres" losses were the SMEM-overflow fallback,
    # not the kres kernel (see docstring); with the round-11 cap fix the
    # plan routes kres (ratio 0.135) and the kernel runs — expectation
    # flipped to pseg accordingly, measured outcome in suite_r11_large.
    ("powerlaw-1M-102M",
     lambda: cached_matrix(
         "suite-large-powerlaw-1M-102M",
         lambda: datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                         dtype=np.float32)),
     {8: None, 32: None}),
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
            # expected: every calibration case prices kres under the cut
            # (mid graphs 0.18-0.21, powerlaw 0.135 post-SMEM-fix); the
            # measured wins live in the suite rows cited in the docstring
            want = "pseg"
            rec["expected"] = want
            rec["ok"] = p.method == want
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
