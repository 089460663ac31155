"""e33b: measure the straggler cost rho ON-CHIP and close e33 (VERDICT r3
item 4).

e33's closed-form cap-vs-divert optimum rides entirely on rho = (cost of
one diverted entry on the XLA gather+scatter side path) / (cost of one
removed 1024-slot round = 8 KB of schedule stream at STREAM rate). e14's
indirect estimate spanned 0.25-1.3 — too wide to decide. This measures the
side path directly: ``y.at[srow].add(sval * x[scol])`` as dependent
iterations at straggler counts spanning the capping regime, on the same
chip and against a fresh STREAM sample.

Then re-runs e33's per-group simulation on powerlaw-1M-102M's actual tail
cells at the MEASURED rho and emits the go/no-go record: positive
projected savings -> wire capping into the hybrid pack; negative -> the
lever is closed with on-chip numbers.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

# SBLAS_COMPILE_CACHE=0 honours bench.py's cache kill switch: one axon
# failure mode wedges cache-enabled clients on their first computation
if os.environ.get("SBLAS_COMPILE_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from sblas import datasets
from sblas.plan_cache import cached_matrix
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth
from e33_tail_cap_divert import tail_cells, simulate
from sblas.ops.kernels.spmv_pseg import hub_relabel

OUT = Path(__file__).parent / "e33_results.jsonl"

M = 1_000_000   # powerlaw-1M row/col space — the design point


def measure_rho():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    recs = []
    for S in (10_000, 100_000, 500_000, 2_000_000):
        srow = jnp.asarray(rng.integers(0, M, S).astype(np.int32))
        scol = jnp.asarray(rng.integers(0, M, S).astype(np.int32))
        sval = jnp.asarray(rng.standard_normal(S).astype(np.float32))

        def step(y, srow, scol, sval, x):
            return y.at[srow].add(sval * x[scol]) * np.float32(1.0 - 1e-7)

        y0 = jnp.zeros(M, jnp.float32)
        per = measure_seconds_per_iter(step, y0, srow, scol, sval, x,
                                       iters_lo=4, iters_hi=12)
        sbw = stream_bandwidth(fresh=True)
        strag_ns = per / S * 1e9
        round_ns = 8192 / (sbw * 1e9) * 1e9
        rho = strag_ns / round_ns
        rec = {"exp": "e33b", "kind": "rho", "S": S,
               "seconds_per_iter": per,
               "ns_per_straggler": round(strag_ns, 3),
               "stream_gbps": round(sbw, 1),
               "ns_per_round": round(round_ns, 3),
               "rho": round(rho, 4)}
        recs.append(rec)
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return recs


def main():
    rho_recs = measure_rho()
    # decision rho: the count regime capping would actually divert is
    # 1e5-2e6 entries (e33 simulate at rho 0.25-0.5 diverts 0.1-2% of
    # 90M tail nnz) — use the asymptotic (large-S) rho, the cheapest the
    # side path ever gets
    rho = min(r["rho"] for r in rho_recs if r["S"] >= 100_000)
    t0 = time.time()
    a = cached_matrix(
        "suite-large-powerlaw-1M-102M",
        lambda: datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                        dtype=np.float32))
    a2, _cp, _rp = hub_relabel(a)
    if a2 is None:
        a2 = a
    print(f"# loaded+relabeled in {time.time()-t0:.1f}s", flush=True)
    cell_sizes, cell_group, hub_nnz, tail_nnz = tail_cells(a2)
    base, saved, div = simulate(cell_sizes, cell_group, rho)
    # projected at the MEASURED per-unit costs
    round_ns = np.median([r["ns_per_round"] for r in rho_recs])
    rec = {
        "exp": "e33b", "kind": "verdict", "case": "powerlaw-1M-102M",
        "rho_measured": rho, "tail_nnz": tail_nnz,
        "base_tail_rounds": base, "saved_rounds": saved, "diverted": div,
        "base_tail_fill": round(tail_nnz / (base * 1024), 4),
        "capped_tail_fill": round(
            (tail_nnz - div) / max((base - saved) * 1024, 1), 4),
        "divert_frac": round(div / max(tail_nnz, 1), 5),
        "rounds_saved_frac": round(saved / max(base, 1), 4),
        "proj_ms_saved": round((saved - rho * div) * round_ns * 1e-6, 3),
        "go": bool((saved - rho * div) * round_ns * 1e-6 > 0.1),
    }
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
