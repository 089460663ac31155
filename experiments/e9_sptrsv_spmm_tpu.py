"""Measure Pallas SpTRSV + SpMM on real TPU vs goldens and jnp reference."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
sys.path.insert(0, "/root/repo")
from sblas import datasets
from sblas.golden import sptrsv_golden, spmm_golden, rel_err
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

P = lambda *a: print(*a, flush=True)
sbw = stream_bandwidth()
P(f"STREAM {sbw:.1f} GB/s")

# --- SpTRSV: banded lower-tri (wide levels) + narrow-level factor ---
from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv

def chol_factor_f32():
    a = datasets.poisson2d(80, dtype=np.float64)  # 6400 rows SPD
    return datasets.cholesky_factor(a, dtype=np.float32)

for name, lfn in [
    ("band-parallel", lambda: datasets.lower_triangular(
        62451, 30, bandwidth=4000, seed=1, dtype=np.float32)),
    ("chol-poisson2d-140", chol_factor_f32),
]:
    l = lfn()
    try:
        t0 = time.time()
        p = PallasSptrsv(l)
        P(f"{name}: n={l.shape[0]} nnz={l.nnz} nlevels={p.nlevels} "
          f"blocks={p.layout.num_blocks} tiles={p.layout.num_tiles} "
          f"analysis {time.time()-t0:.1f}s")
        b = np.random.default_rng(0).standard_normal(l.shape[0]).astype(np.float32)
        arrs = p.device_arrays()
        b2d = jnp.asarray(p.b_to_b2d(b))
        x2d = jax.jit(p.solve_permuted)(arrs, b2d)
        x = p.x2d_to_x(np.asarray(x2d))
        err = rel_err(x, sptrsv_golden(l, b))

        def step(bc, arrs, b2d):
            x2d = p.solve_permuted(arrs, b2d + bc * 1e-30)
            return jnp.float32(1e-30) * x2d[0, 0]

        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, b2d,
                                       iters_lo=4, iters_hi=16, repeats=2)
        by = p.bytes_per_iter
        P(f"  err={err:.1e} {per*1e3:.3f} ms  {by/per/1e9:.1f} GB/s "
          f"({100*by/per/1e9/sbw:.1f}%)  {2*l.nnz/per/1e9:.1f} GFLOP/s  "
          f"{p.nlevels/per:.0f} levels/s")
    except Exception as e:
        P(f"{name}: FAIL {str(e)[:300]}")

# --- SpMM pallas K=8/32 on consph-like ---
from sblas.ops.kernels.spmm_pallas import PallasSpmm

a = datasets.emulate("consph", dtype=np.float32)
P(f"consph-like: {a.shape[0]} nnz={a.nnz}")
try:
    p = PallasSpmm(a)
    arrs = p.device_arrays()
    for k in (8, 32):
        x0 = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((a.shape[1], k)).astype(np.float32))
        y = np.asarray(jax.jit(p.apply_pure)(arrs, x0))
        err = rel_err(y, spmm_golden(a, np.asarray(x0)))

        def step(x, arrs, x0):
            return x0 + 1e-30 * p.apply_pure(arrs, x)

        per = measure_seconds_per_iter(step, x0, arrs, x0,
                                       iters_lo=3, iters_hi=10, repeats=2)
        by = p.bytes_per_iter + a.shape[1] * k * 8
        P(f"  K={k}: err={err:.1e} {per*1e3:.3f} ms  {by/per/1e9:.1f} GB/s "
          f"({100*by/per/1e9/sbw:.1f}%)  {2*a.nnz*k/per/1e9:.1f} GFLOP/s")
except Exception as e:
    P(f"spmm FAIL: {str(e)[:300]}")
