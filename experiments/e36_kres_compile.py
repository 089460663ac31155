"""e36: why does the k-resident PSEG SpMM executor fail Mosaic compile at
1M rows? (VERDICT r4 item 2 — make the plan-time route model honest.)

The committed suite_r10_large powerlaw rows show `route_reason: ratio
0.135 -> kres pseg` followed by `fallback: mosaic-compile`: the plan-time
bytes model prices a kernel that never runs at this scale. This script
forces the kres executor on powerlaw-1M-102M (warm matrix cache), prints
its geometry (kc, ranges, gspan, tiles, Xt stages), and attempts the exact
jitted apply_permuted compile that bench_spmm probes — capturing the real
Mosaic error so the plan-time guard can test the same constraint without
needing a device compile.

Run on TPU: SBLAS_COMPILE_CACHE=0 python experiments/e36_kres_compile.py [k]
"""
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sblas import datasets
from sblas.plan_cache import cached_matrix
from sblas.ops.kernels.spmm_pseg import PallasSpmmScattered


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t0 = time.time()
    a = cached_matrix(
        "suite-large-powerlaw-1M-102M",
        lambda: datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                        dtype=np.float32))
    print(f"[{time.time()-t0:7.1f}s] matrix nnz={a.nnz}", flush=True)
    ps = PallasSpmmScattered(a, k_hint=k, kres=True)
    w = ps.layout
    G, gy, xrp, gspan = ps._kres_geo
    print(f"[{time.time()-t0:7.1f}s] kres geometry: kc={ps._kc} ch={ps._ch} "
          f"G={G} gy={gy} gspan={gspan} ranges={len(ps._kranges)}",
          flush=True)
    for i, (hub_r, tail_r, ht, tt, g0, g1) in enumerate(ps._kranges):
        print(f"  range {i}: hub_tiles={ht} tail_tiles={tt} groups "
              f"[{g0},{g1}) hub_rows={hub_r['val'].shape} "
              f"tail_rows={tail_r['val'].shape}", flush=True)
    print(f"  layout: th={w.th} x2d_rows={w.x2d_rows} y_rows={w.y_rows} "
          f"num_tiles={w.num_tiles} n_hub_rounds={w.n_hub_rounds}",
          flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((a.shape[1], k)).astype(np.float32))
    xp = x[jnp.asarray(ps.colperm), :]

    def step(xq, arrs):
        return ps.apply_permuted(arrs, xq)

    try:
        t1 = time.time()
        f = jax.jit(step)
        arrs = ps.device_arrays()
        y = jax.block_until_ready(f(xp, arrs))
        print(f"[{time.time()-t0:7.1f}s] COMPILED+RAN ok in "
              f"{time.time()-t1:.1f}s, y shape {y.shape}", flush=True)
        # steady-state: marginal cost of 3 extra iters (readback-barrier
        # protocol lives in bench_lib; this is a rough GO/NO-GO number)
        for iters in (2, 5):
            t1 = time.time()
            for _ in range(iters):
                y = f(xp, arrs)
            jax.block_until_ready(y)
            print(f"  {iters} iters: {(time.time()-t1)/iters*1e3:.2f} "
                  f"ms/iter", flush=True)
        print(f"  bytes model: {ps.bytes_per_iter/1e9:.3f} GB/iter",
              flush=True)
    except Exception:
        print(f"[{time.time()-t0:7.1f}s] COMPILE FAILED:", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
