"""e19: PSEG SpMV tile-height sweep on powerlaw-1M (round 6).

Hypothesis: the 52.7%-of-STREAM powerlaw-1M SpMV record (suite_r5_large)
is partly GRID-bound, not gather-bound: ~88K rounds at th=256 is ~2.75K
grid steps x ~350 ns = ~1 ms of the 3.39 ms iter.  th=512/1024 quarters
the step count at the cost of a longer unrolled kernel body (ns = th/8
rounds per tile — Mosaic compile risk is the reason th started at 256).

Writes one JSON line per th to e19_results.jsonl and stdout; packs are
plan-cache keyed by th (pre-warm with experiments/prepack_r6.py --th).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from sblas import datasets
from sblas.golden import spmv_golden, rel_err
from sblas.ops.kernels.spmv_pseg import PallasSpmvScattered
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

OUT = Path(__file__).resolve().parent / "e19_results.jsonl"


def main():
    sbw = stream_bandwidth()
    print(f"# STREAM {sbw:.1f} GB/s", flush=True)
    t0 = time.time()
    a = datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                dtype=np.float32)
    print(f"# gen {time.time() - t0:.1f}s nnz={a.nnz}", flush=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    golden = spmv_golden(a, x)
    for th in (256, 512, 1024):
        try:
            t0 = time.time()
            ex = PallasSpmvScattered(a, th=th, hybrid=True)
            pack_s = time.time() - t0
            import jax.numpy as jnp

            xp = jnp.asarray(x)[jnp.asarray(ex.colperm)]

            def step(xc, arrs, x0):
                return x0 + 1e-6 * ex.apply_permuted(arrs, xc)

            per = measure_seconds_per_iter(step, xp, ex.device_arrays(), xp,
                                           iters_lo=5, iters_hi=15)
            y = np.asarray(ex.apply_pure(ex.device_arrays(),
                                         jnp.asarray(x)))
            err = rel_err(y, golden)
            gbps = ex.bytes_per_iter / per / 1e9
            rec = {"name": "e19_pseg_th", "th": th,
                   "seconds_per_iter": per, "gbps": gbps,
                   "pct_stream": 100 * gbps / sbw, "rel_err": float(err),
                   "tiles": ex.layout.num_tiles, "pack_s": round(pack_s, 1),
                   "nnz": a.nnz}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except Exception as e:
            print(f"# th={th} FAIL: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
