"""e21: PSEG tile-height sweep, wide coverage (round 6 follow-up to e19).

e19 (powerlaw-1M, 101.2M nnz) showed th=256 -> 54.3%, 512 -> 62.2%,
1024 -> 67.8% of STREAM: the grid-step overhead hypothesis confirmed.
Open questions this experiment answers:

  1. does th=2048 keep paying on powerlaw-1M (or does the unrolled
     kernel body hit Mosaic compile limits / VMEM tile pressure)?
  2. do the MID-SIZE suite graphs (uk-2002@0.05 = 14.4M nnz,
     twitter7@0.02 = 28.5M nnz, both committed at th=256: 56.6%/54.9%)
     gain the same way, i.e. should the DEFAULT th change?

One JSON line per (matrix, th) to e21_results.jsonl.
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

OUT = Path(__file__).resolve().parent / "e21_results.jsonl"


def run_case(tag, a, ths, sbw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    golden = spmv_golden(a, x)
    for th in ths:
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
            rec = {"name": "e21_pseg_th", "matrix": tag, "th": th,
                   "seconds_per_iter": per, "gbps": gbps,
                   "pct_stream": 100 * gbps / sbw, "rel_err": float(err),
                   "tiles": ex.layout.num_tiles, "pack_s": round(pack_s, 1),
                   "nnz": a.nnz}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except Exception as e:
            print(f"# {tag} th={th} FAIL: {str(e)[:300]}", flush=True)


def main():
    sbw = stream_bandwidth()
    print(f"# STREAM {sbw:.1f} GB/s", flush=True)

    for name, scale, ths in (("uk-2002", 0.05, (512, 1024)),
                             ("twitter7", 0.02, (512, 1024))):
        t0 = time.time()
        g = datasets.emulate(name, scale=scale, dtype=np.float32)
        print(f"# gen {name}@{scale} {time.time() - t0:.1f}s nnz={g.nnz}",
              flush=True)
        run_case(f"{name}@{scale}", g, ths, sbw)

    t0 = time.time()
    a = datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                dtype=np.float32)
    print(f"# gen powerlaw-1M {time.time() - t0:.1f}s nnz={a.nnz}",
          flush=True)
    run_case("powerlaw-1M-102M", a, (2048,), sbw)


if __name__ == "__main__":
    main()
