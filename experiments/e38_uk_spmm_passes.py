"""e38: uk-2002-full SpMM k=8/32 measurement (VERDICT r4 item 1).

The standard bench harness (fori-loop feedback carry, utils/timing.py)
RESOURCE_EXHAUSTEDs at this scale: the spmv_passes plan is 7.4 GiB of HBM
and the loop executable's working set (carry double-buffer + per-column
range outputs + XLA temps) pushes past 16 GiB even in a fresh process —
measured three ways (in-suite, in-suite with jit-cache clear + gc, fresh
subprocess). A python-loop marginal measurement fits: each dispatch is a
full device execution, completion is a value readback, and the marginal
cost (t(1+K) - t(1)) / K cancels the constant dispatch+readback overhead
— the same statistic the fori harness reports, without the resident
carry. Validation against scipy golden first, same as bench_spmm.

Emits bench-style JSON rows (protocol: "python-loop-marginal") appended
to suite_r11_large.jsonl. Run on TPU in a FRESH process per k:
    python experiments/e38_uk_spmm_passes.py 8
    python experiments/e38_uk_spmm_passes.py 32
"""
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


def fetch(y):
    # non-copying completion barrier: jnp.ravel would materialize a full
    # second copy of the (18.5M, k) result — that copy was the final straw
    # in the first e38 OOM
    np.asarray(jax.device_get(y[:1, :1]))


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t0 = time.time()
    a = cached_matrix(
        "suite-large-uk-2002-full",
        lambda: datasets.emulate("uk-2002", scale=1.0, dtype=np.float32))
    print(f"[{time.time()-t0:7.1f}s] nnz={a.nnz}", flush=True)
    plan = SpmmPlan(a, "auto", k_hint=k)
    print(f"[{time.time()-t0:7.1f}s] method={plan.method} "
          f"route={plan.route_reason}", flush=True)
    n = a.shape[1]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    # validate on the drop-in path (includes the two relabel gathers)
    y = np.asarray(jax.jit(plan.apply_pure)(plan.device_arrays(), x))
    err = rel_err(y, spmm_golden(a, np.asarray(x)))
    print(f"[{time.time()-t0:7.1f}s] rel_err={err:.2e}", flush=True)
    assert err < 2e-5, err
    del y
    # free the validation executable and the un-permuted x before the
    # timed phase: at 7.4 GiB of plan arrays every 0.6 GiB matters
    # timed path: permuted space, gathers amortized (bench_spmm protocol
    # for spmv_passes over a pseg SpMV)
    ps = plan._spmv._pallas
    x_t = x[jnp.asarray(ps.colperm), :]
    del x
    import gc

    jax.clear_caches()
    gc.collect()
    arrs = plan.device_arrays()
    f = jax.jit(plan.apply_permuted)

    def timed(reps):
        t1 = time.time()
        ys = None
        for _ in range(reps):
            ys = f(arrs, x_t)
        fetch(ys)
        return time.time() - t1

    fetch(f(arrs, x_t))          # compile + warm
    pairs = []
    for _ in range(3):
        t_1 = min(timed(1), timed(1))
        reps = 5
        t_k = timed(reps)
        per = (t_k - t_1) / (reps - 1)
        sbw = stream_bandwidth(fresh=True)
        pairs.append((per, sbw))
        print(f"  t1={t_1*1e3:.1f} ms t{reps}={t_k*1e3:.1f} ms -> "
              f"{per*1e3:.1f} ms/iter (STREAM {sbw:.0f})", flush=True)
    pairs.sort()
    per, sbw = pairs[len(pairs) // 2]
    nbytes = plan.bytes_per_iter_nx + (a.shape[0] + 3 * n) * k * 4
    rec = {
        "name": f"spmm_k{k}", "seconds_per_iter": per,
        "gflops": 2.0 * a.nnz * k / per / 1e9,
        "gbps": nbytes / per / 1e9,
        "method": plan.method, "nnz": int(a.nnz), "m": int(a.shape[0]),
        "k": k, "dtype": "float32", "route_reason": plan.route_reason,
        "rel_err": float(err),
        "protocol": "python-loop-marginal (fori harness exceeds HBM at "
                    "this scale; see e38 docstring)",
        "permutes": "amortized (hub-relabeled space)",
        "stream_gbps": sbw,
        "pct_stream": 100.0 * nbytes / per / 1e9 / sbw,
        "matrix": "uk-2002-full",
    }
    with open(OUT, "a") as fo:
        fo.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
