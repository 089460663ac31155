"""Measure w-SELL v3 kernel variants on real TPU: correctness + marginal BW."""
import sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
sys.path.insert(0, "/root/repo")
from sblas import datasets
from sblas.ops.kernels.spmv_pallas import PallasSpmv
from sblas.golden import spmv_golden, rel_err
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

P = lambda *a: print(*a, flush=True)
sbw = stream_bandwidth()
P(f"STREAM: {sbw:.1f} GB/s")

for name in ("cant", "pwtk"):
    a = datasets.emulate(name, dtype=np.float32)
    m, n = a.shape
    P(f"--- {name} {m} nnz={a.nnz}")
    x0j = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
    for (sub, nwin, th, wg) in ((16, 2, 1024, 4),):
        try:
            p = PallasSpmv(a, sub=sub, nwin=nwin, th=th, wgroup=wg, min_fill=0.0)
            y = np.asarray(jax.jit(p.apply_pure)(p.device_arrays(), x0j))
            err = rel_err(y, spmv_golden(a, np.asarray(x0j)))
            def step(x, arrs, x0, p=p):
                return x0 + 1e-30 * p.apply_pure(arrs, x)
            per = measure_seconds_per_iter(step, x0j, p.device_arrays(), x0j,
                                           iters_lo=4, iters_hi=16, repeats=2)
            by = p.bytes_per_iter + 2 * n * 4
            P(f"sub={sub} nwin={nwin} th={th} wg={wg}: err={err:.1e} "
              f"{per*1e3:7.3f} ms {by/per/1e9:6.1f} GB/s "
              f"({100*by/per/1e9/sbw:4.1f}% stream) {2*a.nnz/per/1e9:6.1f} GFLOP/s "
              f"fill={p.layout.fill:.2f}")
        except Exception as e:
            P(f"sub={sub} nwin={nwin} th={th} wg={wg}: FAIL {str(e)[:150]}")
