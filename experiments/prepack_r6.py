"""Pre-pack the round-6 large/web matrices into the persistent plan cache.

Packing is host-side and backend-independent (plan_cache keys on matrix
digest + pack params), so running this on the CPU backend while the TPU
tunnel is down makes the later chip run start from warm cache.  Covers:

  * fem-band-1M-112M  — w-SELL pack (SpMV + blocked SpMM reuse it)
  * powerlaw-1M-102M  — hybrid PSEG pack (SpMV + k-resident SpMM reuse it)
  * uk-2002-full      — hybrid PSEG pack at 18.5M rows / 298M nnz

Run: python experiments/prepack_r6.py [--web]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sblas import datasets


def stamp(msg, t0):
    print(f"[{time.time() - t0:8.1f}s] {msg}", flush=True)


def main():
    t0 = time.time()
    if "--web-only" in sys.argv:
        web_case(t0)
        return
    if "--th" in sys.argv:
        # tile-height variants for experiments/e19_pseg_th.py
        g = datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                    dtype=np.float32)
        stamp(f"powerlaw gen done nnz={g.nnz}", t0)
        from sblas.ops.kernels.spmv_pseg import PallasSpmvScattered

        for th in (512, 1024):
            p = PallasSpmvScattered(g, th=th, hybrid=True)
            stamp(f"powerlaw th={th} packed tiles={p.layout.num_tiles}", t0)
            del p
            gc.collect()
        return

    a = datasets.random_csr(1_000_000, 1_000_000, 112, bandwidth=1500,
                            seed=7, dtype=np.float32)
    stamp(f"fem-band gen done nnz={a.nnz}", t0)
    from sblas.ops.spmv import SpmvPlan

    p = SpmvPlan(a, "pallas")
    stamp(f"fem-band w-SELL packed: {p}", t0)
    del a, p
    gc.collect()

    g = datasets.powerlaw_graph(1_000_000, avg_deg=120, seed=7,
                                dtype=np.float32)
    stamp(f"powerlaw gen done nnz={g.nnz}", t0)
    from sblas.ops.kernels.spmv_pseg import PallasSpmvScattered

    p = PallasSpmvScattered(g, hybrid=True)
    stamp(f"powerlaw hybrid PSEG packed fill={p.layout.fill:.2f}", t0)
    del g, p
    gc.collect()

    if "--web" in sys.argv:
        web_case(t0)


def web_case(t0):
    u = datasets.emulate("uk-2002", scale=1.0, dtype=np.float32)
    stamp(f"uk-2002-full gen done nnz={u.nnz}", t0)
    from sblas.ops.kernels.spmv_pseg import PallasSpmvScatteredBig

    p = PallasSpmvScatteredBig(u)
    stamp(f"uk-2002-full packed fill={p.layout.fill:.2f} "
          f"ranges={len(p._mm._kranges)} kc={p._mm._kc} "
          f"geo={p._mm._kres_geo}", t0)


if __name__ == "__main__":
    main()
