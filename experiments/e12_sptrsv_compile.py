"""Reproduce + fix the Mosaic compile crash on chol-nd SpTRSV (round 3).

suite_tpu_r3: sptrsv/sptrsm on chol(poisson2d_nd(120)) crash the remote
compile helper (HTTP 500), while band-parallel (n_dense=0) compiles fine.
Hypothesis: the dense-tail hybrid doubles the per-round unrolled body
(two pl.when branches, 8 sublane stores + an MXU matvec), and at th=256
(32 rounds/tile) the program exceeds the Mosaic compile budget.

Sweep th for the dense-tail layout; also solve band-parallel at the same
th values to separate "dense-tail branch" from "program size".
"""
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from sblas import datasets
from sblas.golden import sptrsv_golden, rel_err
from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv
from sblas.utils.timing import measure_seconds_per_iter

P = lambda *a: print(*a, flush=True)


def drive(name, l, th):
    try:
        import jax.numpy as jnp

        plan = PallasSptrsv(l, th=th)
        b = np.random.default_rng(0).standard_normal(
            l.shape[0]).astype(np.float32)
        arrs = plan.device_arrays()
        b2d = jnp.asarray(plan.b_to_b2d(b))

        import functools

        @functools.partial(jax.jit, static_argnums=())
        def step(b2d, arrs):
            return plan.solve_permuted(arrs, b2d)

        x2d = step(b2d, arrs)
        x = plan.x2d_to_x(np.asarray(x2d))
        err = rel_err(x, sptrsv_golden(l, b))
        per = measure_seconds_per_iter(
            lambda c, arrs: c + step(c, arrs)[0, 0] * 1e-30,
            b2d, arrs, iters_lo=4, iters_hi=16, repeats=2)
        P(f"{name:24s} th={th:4d} ndense={plan.n_dense_blocks:3d} "
          f"nlev={plan.nlevels:4d} {per*1e3:8.3f} ms  err={err:.2e}")
    except Exception as e:
        P(f"{name:24s} th={th:4d} FAIL {str(e)[:160]}")


def main():
    spd = datasets.poisson2d_nd(120, dtype=np.float64)
    chol = datasets.cholesky_factor(spd, dtype=np.float32)
    P(f"# chol-nd n={chol.shape[0]} nnz={chol.nnz}")
    for th in (256, 128, 64):
        drive("chol-nd-poisson2d-120", chol, th)
    band = datasets.lower_triangular(62451, 30, bandwidth=4000, seed=1,
                                     dtype=np.float32)
    for th in (256,):
        drive("band-parallel", band, th)


if __name__ == "__main__":
    main()
