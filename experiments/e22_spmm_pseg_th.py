"""e22: PSEG SpMM tile-height sweep (k=8, kres executor).

e19/e21 showed the PSEG SpMV grid is step-overhead-bound at th=256 and
th=1024 buys +8-13% of STREAM on every graph >= 8M nnz.  The kres SpMM
executor reads the SAME schedule once for all 8 RHS, so its grid-step
count per byte is already 1/?th of SpMV's — but its committed records
(uk-2002@0.05: 19.7%, twitter7@0.02: 17.8%) leave so much room that the
segment-padding cost of bigger tiles (every (y group, Xt chunk) segment
pads to a whole tile) may still be worth paying.  This sweeps th for the
k=8 kres path on the two suite graphs.
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
from sblas.golden import spmm_golden, rel_err
from sblas.ops.kernels.spmm_pseg import PallasSpmmScattered
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

OUT = Path(__file__).resolve().parent / "e22_results.jsonl"
K = 8


def run_case(tag, a, ths, sbw):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.standard_normal((a.shape[1], K)).astype(np.float32)
    golden = spmm_golden(a, x)
    for th in ths:
        try:
            t0 = time.time()
            ex = PallasSpmmScattered(a, th=th, hybrid=True, k_hint=K)
            pack_s = time.time() - t0
            xp = jnp.asarray(x)[jnp.asarray(ex.colperm), :]

            def step(xc, arrs, x0):
                return x0 + 1e-6 * ex.apply_permuted(arrs, xc)

            per = measure_seconds_per_iter(step, xp, ex.device_arrays(), xp,
                                           iters_lo=3, iters_hi=8)
            y = np.asarray(ex.apply_pure(ex.device_arrays(),
                                         jnp.asarray(x)))
            err = rel_err(y, golden)
            gbps = ex.bytes_per_iter / per / 1e9
            rec = {"name": "e22_spmm_pseg_th", "matrix": tag, "k": K,
                   "th": th, "kres": bool(ex._kres),
                   "seconds_per_iter": per, "gbps": gbps,
                   "pct_stream": 100 * gbps / sbw, "rel_err": float(err),
                   "pack_s": round(pack_s, 1), "nnz": a.nnz}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except Exception as e:
            print(f"# {tag} th={th} FAIL: {str(e)[:300]}", flush=True)


def main():
    sbw = stream_bandwidth()
    print(f"# STREAM {sbw:.1f} GB/s", flush=True)
    for name, scale in (("uk-2002", 0.05), ("twitter7", 0.02)):
        t0 = time.time()
        g = datasets.emulate(name, scale=scale, dtype=np.float32)
        print(f"# gen {name}@{scale} {time.time() - t0:.1f}s nnz={g.nnz}",
              flush=True)
        run_case(f"{name}@{scale}", g, (512, 1024), sbw)


if __name__ == "__main__":
    main()
