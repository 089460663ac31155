"""e30: FEM-large SpMM — what beats k SpMV passes? (VERDICT r2 item 2)

Host analysis first (printed below): on RANDOM-in-band structure the panel
density is height-invariant — a (h x 128) panel holds ~h*deg*128/(2*bw)
nnz, so density = nnz/(h*128) is the same for h = 8, 32, 128. Dense-panel
bytes are 4/density per nnz for ANY panel shape; rectangular panels cannot
manufacture density that 128x128 blocks lack. The VERDICT's "rect panel"
hope therefore reduces to an economics question, measured here on the real
chip (band1500-100K, the fem-band-1M-112M proxy from e29):

  (a) k-aware dense routing: BSR-T streams blocks ONCE for all k RHS
      (4/density B/nnz total) vs spmv_passes at k * 6/fill B/nnz.
      At density 0.035, fill 0.42: dense 114 B/nnz vs passes 14.3*k —
      crossover near k=8, dense should win ~4x at k=32. The 0.04 cutoff
      is k-blind and refuses both.
  (b) w-SELL sub sweep: fill sets the passes bound AND the SpMV headline;
      pick_sub optimizes round count, but maybe a forced sub lifts fill.

Output: one JSON line per measurement -> e30_results.jsonl; the decision
(k-aware cutoff in ops/spmm.py auto chain) cites these rows.
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sblas import datasets, bench_lib  # noqa: E402
from sblas.golden import spmm_golden, rel_err  # noqa: E402
from sblas.retile_bsr import bsr_stats  # noqa: E402
from sblas.utils.timing import measure_seconds_per_iter  # noqa: E402

OUT = Path(__file__).parent / "e30_results.jsonl"
_EPS = 1e-30


def emit(d):
    with open(OUT, "a") as f:
        f.write(json.dumps(d) + "\n")
    print(json.dumps(d), flush=True)


def bench_bsrt(a, k, min_density):
    from sblas.ops.kernels.spmm_bsr_pallas import PallasSpmmBsrT

    p = PallasSpmmBsrT(a, min_density=min_density, k_hint=k)
    n = a.shape[1]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    arrs = p.device_arrays()
    y = np.asarray(jax.jit(p.apply_pure)(arrs, x0))
    err = rel_err(y, spmm_golden(a, np.asarray(x0)))

    def step(x, arrs, x0):
        return x0 + _EPS * p.apply_pure(arrs, x)

    per = measure_seconds_per_iter(step, x0, arrs, x0, iters_lo=3,
                                   iters_hi=10)
    return {"name": f"bsr_t_k{k}", "seconds_per_iter": per,
            "rel_err": err, "density": p.density,
            "gbps": p.bytes_per_iter / per / 1e9}


def main():
    a = datasets.random_csr(100_000, 100_000, 112, bandwidth=1500, seed=7,
                            dtype=np.float32)
    print(f"# matrix 100K x 100K, nnz={a.nnz}", flush=True)

    # host analysis: density is height-invariant on random-in-band
    dens = {br: bsr_stats(a, br=br, bc=128)["density"]
            for br in (8, 16, 32, 64, 128)}
    emit({"name": "panel_density_by_height", **{str(k): round(v, 4)
                                                for k, v in dens.items()}})

    # (b) w-SELL SpMV sub sweep: fill vs time
    for sub in (0, 4, 8, 16):
        try:
            from sblas.ops.spmv import SpmvPlan
            from sblas.ops.kernels.spmv_pallas import PallasSpmv

            p = PallasSpmv(a, sub=sub) if sub else None
            rec = bench_lib.bench_spmv(a, method="pallas", iters=20) \
                if sub == 0 else None
            if sub == 0:
                d = rec.as_dict()
                emit({"name": "spmv_sub_auto", "sub": p0_sub(a),
                      "fill": d["fill"], "us": d["seconds_per_iter"] * 1e6,
                      "pct_stream": d["pct_stream"]})
                continue
            rng = np.random.default_rng(0)
            x0 = jnp.asarray(rng.standard_normal(a.shape[1]).astype(
                np.float32))
            arrs = p.device_arrays()
            y = np.asarray(jax.jit(p.apply_pure)(arrs, x0))
            from sblas.golden import spmv_golden
            err = rel_err(y, spmv_golden(a, np.asarray(x0)))

            def step(x, arrs, x0):
                return x0 + _EPS * p.apply_pure(arrs, x)

            per = measure_seconds_per_iter(step, x0, arrs, x0,
                                           iters_lo=4, iters_hi=20)
            emit({"name": f"spmv_sub{sub}", "fill": p.layout.fill,
                  "us": per * 1e6, "rel_err": err,
                  "gbps": p.bytes_per_iter / per / 1e9})
        except Exception as e:
            emit({"name": f"spmv_sub{sub}", "fail": str(e)[:200]})

    # (a) spmv_passes vs dense BSR-T at k = 8 and 32
    for k in (8, 32):
        try:
            rec = bench_lib.bench_spmm(a, k, method="spmv_passes", iters=8)
            d = rec.as_dict()
            emit({"name": f"spmv_passes_k{k}",
                  "us": d["seconds_per_iter"] * 1e6,
                  "rel_err": d.get("rel_err"),
                  "pct_stream": d["pct_stream"]})
        except Exception as e:
            emit({"name": f"spmv_passes_k{k}", "fail": str(e)[:200]})
        try:
            d = bench_bsrt(a, k, min_density=0.0)
            d["us"] = d.pop("seconds_per_iter") * 1e6
            emit(d)
        except Exception as e:
            emit({"name": f"bsr_t_k{k}", "fail": str(e)[:300]})


def p0_sub(a):
    from sblas.retile_wsell import pick_sub

    return pick_sub(a)


if __name__ == "__main__":
    main()
