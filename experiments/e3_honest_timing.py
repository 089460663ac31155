"""Experiment 3: honest device timing via dependent iterations inside one jit.

The axon-tunneled platform makes naive dispatch-loop timing meaningless
(e1/e2 measured 32 TB/s STREAM). Here every benchmark runs `iters` dependent
iterations inside a single jitted fori_loop, so XLA cannot elide or overlap
them, and we report (t_loop(iters) - t_loop(0-ish)) / iters.
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import sys
sys.path.insert(0, "/root/repo")
from sblas import datasets


def timed_loop(step, init_x, iters):
    """step: x -> y (same shape family). Returns per-iter seconds."""

    @jax.jit
    def run(x, n):
        def body(i, x):
            return step(x)
        return lax.fori_loop(0, n, body, x)

    one = jnp.int32(1); many = jnp.int32(iters)
    jax.block_until_ready(run(init_x, one))  # single compile (dynamic bound)
    t0 = time.perf_counter()
    jax.block_until_ready(run(init_x, many))
    t1 = time.perf_counter()
    jax.block_until_ready(run(init_x, one))
    t2 = time.perf_counter()
    return ((t1 - t0) - (t2 - t1)) / max(iters - 1, 1)


def main():
    ITERS = 50
    print("start", flush=True)

    # ---- STREAM triad (read 2, write 1) ----
    N = 64 * 1024 * 1024
    b = jnp.full((N,), 1e-9, jnp.float32)

    def triad(x):
        return x + 1e-6 * b

    t = timed_loop(triad, jnp.zeros((N,), jnp.float32), ITERS)
    print(f"STREAM triad: {t*1e3:8.3f} ms  {3*N*4/t/1e9:8.1f} GB/s")

    # ---- big matrix so A cannot live in VMEM across iters ----
    print("gen matrix...", flush=True)
    a = datasets.emulate("pwtk", scale=1.0, dtype=np.float32)  # ~11.6M nnz
    m, n = a.shape
    nnz = a.nnz
    print(f"matrix pwtk-like: {m}x{n} nnz={nnz} ({nnz/m:.1f}/row)")

    rows = jnp.asarray(a.row_ids())
    cols = jnp.asarray(a.indices)
    vals = jnp.asarray(a.data)

    def coo_step(x):
        y = jax.ops.segment_sum(vals * x[cols], rows, num_segments=m)
        return x + 1e-20 * y[:n] if m >= n else x

    t = timed_loop(coo_step, jnp.ones((n,), jnp.float32), ITERS)
    by = nnz * 12
    print(f"COO segsum:   {t*1e3:8.3f} ms  {by/t/1e9:8.1f} GB/s  ({2*nnz/t/1e9:.1f} GFLOP/s)")

    # ---- ELL ----
    deg = a.row_lengths
    K = int(deg.max()); Kpad = ((K + 7) // 8) * 8
    rr = a.row_ids(); pos = np.arange(nnz) - a.indptr[:-1].astype(np.int64)[rr]
    col_ell = np.zeros((m, Kpad), np.int32); val_ell = np.zeros((m, Kpad), np.float32)
    col_ell[rr, pos] = a.indices; val_ell[rr, pos] = a.data
    cd, vd = jnp.asarray(col_ell), jnp.asarray(val_ell)
    fill = nnz / (m * Kpad)
    print(f"ELL: Kpad={Kpad} fill={fill:.2f}")

    def ell_step(x):
        y = jnp.sum(vd * x[cd], axis=1)
        return x + 1e-20 * y

    t = timed_loop(ell_step, jnp.ones((n,), jnp.float32), ITERS)
    by = m * Kpad * 8
    print(f"ELL gather:   {t*1e3:8.3f} ms  {by/t/1e9:8.1f} GB/s padded ({nnz*8/t/1e9:.1f} useful)")

    # ---- pure gather rate ----
    M = 32 * 1024 * 1024
    idx = jnp.asarray(np.random.default_rng(0).integers(0, n, M, dtype=np.int32))
    xs = jnp.ones((n,), jnp.float32)

    def gath_step(s):
        g = xs[idx] + s
        return s + 1e-20 * jnp.sum(g)

    t = timed_loop(gath_step, jnp.float32(0.0), ITERS)
    print(f"XLA gather:   {t*1e3:8.3f} ms  {M/t/1e9:8.2f} Gelem/s ({M*4/t/1e9:.1f} GB/s idx)")


if __name__ == "__main__":
    main()
