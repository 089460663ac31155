"""e38b: uk-2002-full SpMM K=32 via user-level K-chunking (DESIGN r11).

The single-dispatch K=32 path exceeds single-chip HBM (e38: X/Y + the
32-column stacked apply peak ~12 GiB next to the 7.4 GiB passes plan).
The supported shape is 4 sequential K=8 chunks; this measures exactly
that: every chunk validated against its scipy golden slice, every chunk
timed with the python-loop marginal protocol, the row's seconds = the sum
of the four measured chunk costs (the chunks are byte-identical work).

Appends a bench-style spmm_k32 row to suite_r11_large.jsonl.
"""
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sblas import datasets
from sblas.golden import spmm_golden, rel_err
from sblas.ops.spmm import SpmmPlan
from sblas.plan_cache import cached_matrix
from sblas.utils.timing import stream_bandwidth

OUT = Path(__file__).parent.parent / "benchmarks" / "results" / \
    "suite_r11_large.jsonl"
KC = 8
K = 32


def fetch(y):
    np.asarray(jax.device_get(y[:1, :1]))


def main():
    t0 = time.time()
    a = cached_matrix(
        "suite-large-uk-2002-full",
        lambda: datasets.emulate("uk-2002", scale=1.0, dtype=np.float32))
    print(f"[{time.time()-t0:7.1f}s] nnz={a.nnz}", flush=True)
    plan = SpmmPlan(a, "auto", k_hint=KC)
    print(f"[{time.time()-t0:7.1f}s] method={plan.method} "
          f"route={plan.route_reason}", flush=True)
    assert plan.method == "spmv_passes"
    n = a.shape[1]
    rng = np.random.default_rng(0)
    xnp = rng.standard_normal((n, K)).astype(np.float32)
    ps = plan._spmv._pallas
    colperm = np.asarray(ps.colperm)
    arrs = plan.device_arrays()
    f = jax.jit(plan.apply_permuted)
    rowperm = np.asarray(ps.rowperm)
    inv_row = np.empty(a.shape[0], dtype=np.int64)
    inv_row[rowperm] = np.arange(a.shape[0])

    total = 0.0
    errs = []
    sbws = []
    for c0 in range(0, K, KC):
        xc = jnp.asarray(xnp[colperm, c0:c0 + KC])
        y = f(arrs, xc)
        # validate this chunk (permuted-space result mapped back)
        err = rel_err(np.asarray(y)[inv_row, :],
                      spmm_golden(a, xnp[:, c0:c0 + KC]))
        errs.append(err)
        assert err < 2e-5, (c0, err)
        del y
        gc.collect()
        # marginal cost of this chunk
        def timed(reps):
            t1 = time.time()
            ys = None
            for _ in range(reps):
                ys = f(arrs, xc)
            fetch(ys)
            return time.time() - t1

        fetch(f(arrs, xc))
        t_1 = min(timed(1), timed(1))
        t_k = timed(5)
        per = (t_k - t_1) / 4
        total += per
        sbws.append(stream_bandwidth(fresh=True))
        print(f"  chunk {c0}:{c0+KC}: {per*1e3:.1f} ms, err {err:.2e}",
              flush=True)
        del xc
        gc.collect()
    sbw = sorted(sbws)[len(sbws) // 2]
    nbytes = 4 * plan.bytes_per_iter_nx + (a.shape[0] + 3 * n) * K * 4
    rec = {
        "name": "spmm_k32", "seconds_per_iter": total,
        "gflops": 2.0 * a.nnz * K / total / 1e9,
        "gbps": nbytes / total / 1e9,
        "method": "spmv_passes (K-chunked 4x8)", "nnz": int(a.nnz),
        "m": int(a.shape[0]), "k": K, "dtype": "float32",
        "route_reason": plan.route_reason + "; single-dispatch K=32 "
                        "exceeds HBM (e38) -> user-level 4x8 chunks",
        "rel_err": float(max(errs)),
        "protocol": "sum of 4 per-chunk python-loop-marginal costs; every "
                    "chunk validated vs its golden slice",
        "permutes": "amortized (hub-relabeled space)",
        "stream_gbps": sbw,
        "pct_stream": 100.0 * nbytes / total / 1e9 / sbw,
        "matrix": "uk-2002-full",
    }
    with open(OUT, "a") as fo:
        fo.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
