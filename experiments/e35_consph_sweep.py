"""e35: consph >=80%-of-STREAM — geometry sweep under the ratio protocol
(VERDICT r3 item 3).

consph is the one FEM SpMV row under the 80% bar in suite_r9: 79.24%
ratio-median-of-5 (pairs 78.7/78.8/79.2/81.5/83.9 — a 5-point wobble band
STRADDLING the bar, so single samples prove nothing). This sweep measures
every (th, sub, wgroup, nwin) neighbor of the auto geometry with the SAME
interleaved protocol (median of 5 kernel/fresh-STREAM pairs per combo), so
a winner — or a ceiling — is established with the drift-immune statistic.

consph geometry context: 83,334 rows, 6M nnz, avg deg 72.1 (the heaviest
rows of the FEM suite), bandwidth-like spread wider than cant. Candidate
levers: taller sub (more rows per block -> fewer, fuller windows for long
rows), wgroup (window-group padding granularity), nwin (x panels per
round), th (tile height = rounds per schedule tile).

Results -> e35_results.jsonl; the suite row stays on auto unless a combo
clears 80% by more than the pair spread.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from sblas import datasets
from sblas.golden import spmv_golden, rel_err
from sblas.ops.kernels.spmv_pallas import PallasSpmv
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

OUT = Path(__file__).resolve().parent / "e35_results.jsonl"
PAIRS = 5


def run(tag, a, combos):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    y_ref = spmv_golden(a, x)
    for th, sub, wgroup, nwin in combos:
        try:
            p = PallasSpmv(a, th=th, sub=sub, wgroup=wgroup, nwin=nwin,
                           min_fill=0.05)
        except Exception as e:
            print(f"# {tag} th={th} sub={sub} wg={wgroup} nwin={nwin} "
                  f"PACK FAIL: {str(e)[:150]}", flush=True)
            continue
        arrs = p.device_arrays()
        xd = jnp.asarray(x)
        y = np.asarray(jax.device_get(p.apply_pure(arrs, xd)))
        rel = rel_err(y, y_ref)

        def step(xc, arrs, x0):
            return x0 + 1e-6 * p.apply_pure(arrs, xc)[: a.shape[1]]

        pairs = []
        try:
            for _ in range(PAIRS):
                per = measure_seconds_per_iter(step, xd, arrs, xd,
                                               iters_lo=10, iters_hi=30)
                sbw = stream_bandwidth(fresh=True)
                pairs.append((p.bytes_per_iter / per / 1e9 / sbw, per, sbw))
        except Exception as e:
            print(f"# {tag} th={th} sub={sub} wg={wgroup} nwin={nwin} "
                  f"TIME FAIL: {str(e)[:150]}", flush=True)
            continue
        pairs.sort()
        ratio, per, sbw = pairs[len(pairs) // 2]
        rec = {"name": "e35_consph_sweep", "matrix": tag, "th": th,
               "sub": sub, "wgroup": wgroup, "nwin": nwin,
               "seconds_per_iter": per,
               "pct_stream": 100 * ratio,
               "protocol": f"ratio-median-of-{PAIRS}",
               "ratio_pairs": [{"pct": round(100 * r, 2),
                                "us": round(pp * 1e6, 2),
                                "stream_gbps": round(s, 1)}
                               for r, pp, s in pairs],
               "fill": p.layout.fill, "rel_err": float(rel),
               "stream_gbps": sbw}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


def main():
    a = datasets.emulate("consph")
    combos = [
        (0, 0, 4, 2),             # auto default (control — the r9 row)
        # sub: taller/shorter row blocks around the auto pick
        (0, 8, 4, 2), (0, 16, 4, 2), (0, 32, 4, 2),
        # wgroup: finer/coarser window-group padding
        (0, 0, 2, 2), (0, 0, 8, 2),
        # nwin: 1/4 x panels per round
        (0, 0, 4, 1), (0, 0, 4, 4),
        # th: taller schedule tiles (fewer grid steps)
        (512, 0, 4, 2), (1024, 0, 4, 2),
        # combined best-guess neighbors for heavy rows
        (0, 16, 2, 2), (0, 16, 4, 4),
    ]
    run("consph", a, combos)


if __name__ == "__main__":
    main()
