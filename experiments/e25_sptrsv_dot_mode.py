"""e25: SpTRSV segment-dot cost — HIGHEST (6 MXU passes) vs split3/split2
bf16 planes vs DEFAULT single pass.

e24 decomposed the wavefront round at 349 ns: gather chain 175 (issue-rate
floor), HIGHEST dot 95, chain 43.  The seg selection matrix is 0/1 = exact
in bf16, so only the product plane needs splitting — split3 should buy
~half the dot budget (the SpMV split3 trick, DESIGN round-3) IF the 5 VPU
split ops don't eat the savings in this issue-bound body.

Measures ns/round AND end-to-end rel_err vs scipy spsolve_triangular per
mode on both suite factors.  Results -> e25_results.jsonl + DESIGN.
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
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve_triangular

from sblas import datasets
from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv
from sblas.utils.timing import measure_seconds_per_iter

OUT = Path(__file__).resolve().parent / "e25_results.jsonl"

MODES = ("highest", "split3", "split2", "default")


def run_case(tag, l):
    rng = np.random.default_rng(0)
    b = rng.standard_normal(l.shape[0]).astype(np.float64)
    a_sp = sp.csr_matrix((l.data.astype(np.float64), l.indices, l.indptr),
                         shape=l.shape)
    x_ref = spsolve_triangular(a_sp, b, lower=True)
    for mode in MODES:
        ex = PallasSptrsv(l, lower=True, dot_mode=mode)
        arrs = ex.device_arrays()
        nrounds = len(ex.layout.round_wrow)
        b2d = jnp.asarray(ex.b_to_b2d(b))

        x2d = ex.solve_permuted(arrs, b2d)
        x = ex.x2d_to_x(np.asarray(jax.device_get(x2d)))
        rel = float(np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref))

        # carry = b2d so the solve depends on the loop index (an earlier
        # version closed over constant inputs and XLA hoisted the whole
        # solve out of the fori_loop: 0.12 ns/round "results").
        def step(b, arrs, b0):
            x2d = ex.solve_permuted(arrs, b)
            return b0 + 1e-6 * jnp.sum(x2d)

        try:
            per = measure_seconds_per_iter(step, b2d, arrs, b2d,
                                           iters_lo=10, iters_hi=30)
        except Exception as e:
            print(f"# {tag} {mode} FAIL: {str(e)[:200]}", flush=True)
            continue
        rec = {"name": "e25_sptrsv_dot_mode", "matrix": tag, "mode": mode,
               "seconds_per_iter": per,
               "ns_per_round": 1e9 * per / nrounds,
               "rel_err": rel, "rounds": nrounds,
               "nwin": ex.layout.nwin, "th": ex.layout.th}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


def main():
    run_case("band-parallel", datasets.lower_triangular(
        62451, 30, bandwidth=4000, seed=1, dtype=np.float32))
    spd = datasets.poisson2d_nd(120, dtype=np.float64)
    run_case("chol-nd-poisson2d-120",
             datasets.cholesky_factor(spd, dtype=np.float32))


if __name__ == "__main__":
    main()
