"""Experiment 1: which gather strategy saturates HBM on a real TPU chip.

Probes (run on v5e, 1 chip):
  A. XLA jit COO path: segment_sum(vals * x[cols], rows)
  B. XLA jit ELL path: sum(vals_ell * x[cols_ell], axis=1)   (one 2D gather)
  C. Pallas kernel with jnp.take gather from a VMEM-resident x
  D. Pallas ELL tile kernel streaming (8,128) tiles with in-kernel gather

Bytes model (fp32): 4B val + 4B col per nnz (+ padding overhead for ELL).
Prints achieved GB/s for each variant. Findings drive sblas/retile.py design.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from sblas import datasets

def timeit(f, *args, iters=20):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())
    a = datasets.emulate("cant", scale=1.0, dtype=np.float32)
    m, n = a.shape
    nnz = a.nnz
    print(f"matrix: {m}x{n}, nnz={nnz}, avg/row={nnz/m:.1f}")
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)

    rows = jnp.asarray(a.row_ids())
    cols = jnp.asarray(a.indices)
    vals = jnp.asarray(a.data)
    xd = jnp.asarray(x)

    # A: COO segment-sum
    @jax.jit
    def coo_spmv(vals, cols, rows, x):
        return jax.ops.segment_sum(vals * x[cols], rows, num_segments=m)

    t = timeit(coo_spmv, vals, cols, rows, x)
    bytes_a = nnz * (4 + 4 + 4)  # val + col + row
    print(f"A: COO segsum   {t*1e3:8.3f} ms   {bytes_a/t/1e9:7.1f} GB/s")

    # B: ELL
    deg = a.row_lengths
    K = int(deg.max())
    Kpad = ((K + 7) // 8) * 8
    print(f"ELL width: max deg {K} -> pad {Kpad}, fill ratio {nnz/(m*Kpad):.2f}")
    col_ell = np.zeros((m, Kpad), dtype=np.int32)
    val_ell = np.zeros((m, Kpad), dtype=np.float32)
    rr = a.row_ids()
    pos = np.arange(nnz) - a.indptr[:-1].astype(np.int64)[rr]
    col_ell[rr, pos] = a.indices
    val_ell[rr, pos] = a.data
    col_d = jnp.asarray(col_ell)
    val_d = jnp.asarray(val_ell)

    @jax.jit
    def ell_spmv(val_ell, col_ell, x):
        return jnp.sum(val_ell * x[col_ell], axis=1)

    t = timeit(ell_spmv, val_d, col_d, xd)
    bytes_b = m * Kpad * 8
    print(f"B: ELL          {t*1e3:8.3f} ms   {bytes_b/t/1e9:7.1f} GB/s (padded bytes)")

    # correctness
    ref = a.to_scipy() @ x
    err = np.max(np.abs(np.asarray(ell_spmv(val_d, col_d, xd)) - ref)) / np.max(np.abs(ref))
    print(f"   ELL rel err: {err:.2e}")

    # C/D: pallas in-kernel gather
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TM = 256  # rows per grid step

    def kern(x_ref, val_ref, col_ref, out_ref):
        v = val_ref[:]
        c = col_ref[:]
        g = jnp.take(x_ref[:], c, axis=0)  # gather from VMEM
        out_ref[:] = jnp.sum(v * g, axis=1, keepdims=True)

    mpad = ((m + TM - 1) // TM) * TM
    colp = np.zeros((mpad, Kpad), np.int32); colp[:m] = col_ell
    valp = np.zeros((mpad, Kpad), np.float32); valp[:m] = val_ell
    colp_d = jnp.asarray(colp); valp_d = jnp.asarray(valp)

    @jax.jit
    def pallas_ell(x, val, col):
        return pl.pallas_call(
            kern,
            grid=(mpad // TM,),
            in_specs=[
                pl.BlockSpec((n if False else x.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, Kpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, Kpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mpad, 1), jnp.float32),
        )(x, val, col)

    try:
        y = pallas_ell(xd, valp_d, colp_d)
        err = np.max(np.abs(np.asarray(y)[:m, 0] - ref)) / np.max(np.abs(ref))
        t = timeit(pallas_ell, xd, valp_d, colp_d)
        print(f"C: pallas take  {t*1e3:8.3f} ms   {mpad*Kpad*8/t/1e9:7.1f} GB/s  err {err:.2e}")
    except Exception as e:
        print("C: pallas take FAILED:", str(e)[:500])


if __name__ == "__main__":
    main()
