"""e15: w-SELL SpMV is VPU-issue-bound — sweep packing density (round 4).

Evidence: bf16 values halve the stream (48 -> 28 MB on cant) yet the time
is unchanged (84.7 vs 84 us) — the kernel is bound by per-round op count,
not bytes. Time therefore scales with SLOTS (1/fill): cant packs at fill
0.455 (2.2 slots/nnz). Sweep (sub, wgroup, th) for fill/time on cant and
pdb1HYS (79.9% — the one FEM case under the 80% north star).
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sblas import datasets
from sblas.golden import spmv_golden, rel_err
from sblas.ops.kernels.spmv_pallas import PallasSpmv
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

_EPS = 1e-6


def main():
    import threading

    print(f"# devices {jax.devices()}", flush=True)

    def _beat():
        i = 0
        while True:
            time.sleep(60)
            i += 1
            print(f"# [beat {i}]", flush=True)

    threading.Thread(target=_beat, daemon=True).start()
    sbw = stream_bandwidth()
    print(f"# STREAM {sbw:.1f} GB/s", flush=True)
    for name in ("cant", "pdb1HYS"):
        a = datasets.emulate(name, dtype=np.float32)
        x = np.random.default_rng(0).standard_normal(a.shape[1]).astype(
            np.float32)
        gold = spmv_golden(a, x)
        x0 = jnp.asarray(x)
        for sub, wgroup in ((16, 8), (16, 4), (16, 16), (8, 8), (32, 8),
                            (16, 32)):
            try:
                p = PallasSpmv(a, sub=sub, wgroup=wgroup, min_fill=0.05)
                arrs = p.device_arrays()
                err = rel_err(np.asarray(p.apply_pure(arrs, x0)), gold)

                def step(xc, arrs, x0):
                    return x0 + _EPS * p.apply_pure(arrs, xc)

                t = measure_seconds_per_iter(step, x0, arrs, x0,
                                             iters_lo=5, iters_hi=25)
                w = p.layout
                gbps = p.bytes_per_iter / t / 1e9
                print(f"{name:8s} sub{sub:2d} wg{wgroup:2d} th{w.th:5d} "
                      f"fill {w.fill:.3f}  {t*1e6:6.1f} us  {gbps:5.1f} GB/s"
                      f" ({100*gbps/sbw:5.1f}%)  rel_err {err:.1e}",
                      flush=True)
            except Exception as e:
                print(f"{name:8s} sub{sub:2d} wg{wgroup:2d} FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
