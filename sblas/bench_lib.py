"""Benchmark drivers shared by the CLI and the top-level bench.py
(layer L5, SURVEY.md C14).

Each bench builds a plan, wraps it in a carry-dependent step (so the timing
harness's fori_loop cannot elide or reorder iterations), measures marginal
seconds/iteration, and reports GFLOP/s, GB/s (from the plan's explicit bytes
model) and % of measured STREAM bandwidth — the BASELINE.md north-star.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .formats import CSR
from .golden import spmv_golden, spmm_golden, sptrsv_golden, rel_err, default_tol
from .ops.spmv import SpmvPlan
from .ops.spmm import SpmmPlan
from .ops.sptrsv import SptrsvPlan
from .utils.timing import BenchRecord, measure_seconds_per_iter, stream_bandwidth

# Keeps the carry numerically equal to x0 while forcing a data dependency on
# the previous iteration's output (tiny*y underflows against x0).
_EPS = 1e-30


def bench_spmv(a: CSR, *, method: str = "auto", validate: bool = True,
               iters: int = 25, with_stream_pct: bool = True) -> BenchRecord:
    m, n = a.shape
    if m != n:
        raise ValueError("bench uses square matrices (carry feedback)")
    plan = SpmvPlan(a, method)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n).astype(a.dtype))

    extra = {"method": plan.method, "nnz": a.nnz, "m": m,
             "dtype": str(np.dtype(a.dtype))}
    if validate:
        y = np.asarray(plan(x0))
        err = rel_err(y, spmv_golden(a, np.asarray(x0)))
        extra["rel_err"] = err
        assert err < default_tol(a.dtype), f"validation failed: {err}"

    def step(x):
        y = plan.apply_traced(x)
        return x0 + _EPS * y

    per = measure_seconds_per_iter(step, x0, iters_lo=max(iters // 5, 2),
                                   iters_hi=iters)
    # carry feedback adds x0-read + x-write ~ 2*n*itemsize; include it.
    feedback_bytes = 2 * n * a.data.itemsize
    rec = BenchRecord(
        name="spmv", seconds_per_iter=per, flops=2.0 * a.nnz,
        bytes=plan.bytes_per_iter + feedback_bytes, extra=extra,
    )
    if with_stream_pct:
        sbw = stream_bandwidth()
        rec.extra["stream_gbps"] = sbw
        rec.extra["pct_stream"] = 100.0 * rec.gbps / sbw
    return rec


def bench_spmm(a: CSR, k: int = 8, *, method: str = "auto",
               validate: bool = True, iters: int = 25,
               with_stream_pct: bool = True) -> BenchRecord:
    m, n = a.shape
    if m != n:
        raise ValueError("bench uses square matrices")
    plan = SpmmPlan(a, method)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n, k)).astype(a.dtype))

    extra = {"method": plan.method, "nnz": a.nnz, "m": m, "k": k,
             "dtype": str(np.dtype(a.dtype))}
    if validate:
        y = np.asarray(plan(x0))
        err = rel_err(y, spmm_golden(a, np.asarray(x0)))
        extra["rel_err"] = err
        assert err < default_tol(a.dtype), f"validation failed: {err}"

    if plan.method == "pallas":
        def step(x):
            return x0 + _EPS * plan._pallas.apply_traced(x)
    elif plan.method == "ell":
        val, col = plan._val, plan._col
        mp = val.shape[0]
        blk = plan._blk(plan._width, k, x0.dtype.itemsize, mp)
        while mp % blk:
            blk -= 8

        def step(x):
            def f(i):
                v = lax.dynamic_slice_in_dim(val, i * blk, blk)
                c = lax.dynamic_slice_in_dim(col, i * blk, blk)
                return jnp.einsum("rw,rwk->rk", v, x[c])

            y = lax.map(f, jnp.arange(mp // blk)).reshape(mp, k)[:m]
            return x0 + _EPS * y
    else:
        raise NotImplementedError(f"bench path for method {plan.method}")

    per = measure_seconds_per_iter(step, x0, iters_lo=max(iters // 5, 2),
                                   iters_hi=iters)
    x_traffic = n * k * a.data.itemsize  # X streamed once (approx; gather)
    feedback = 2 * n * k * a.data.itemsize
    rec = BenchRecord(
        name=f"spmm_k{k}", seconds_per_iter=per, flops=2.0 * a.nnz * k,
        bytes=plan.bytes_per_iter_nx + m * k * a.data.itemsize + x_traffic
        + feedback,
        extra=extra,
    )
    if with_stream_pct:
        sbw = stream_bandwidth()
        rec.extra["stream_gbps"] = sbw
        rec.extra["pct_stream"] = 100.0 * rec.gbps / sbw
    return rec


def sptrsv_reference_step(l: CSR):
    """The naive jnp masked-wavefront solver (BASELINE config #3's '>=10x
    over pure-jnp loop' baseline): per level, recompute the full residual and
    update only that level's rows — O(nlevels * nnz) work, no schedule."""
    from .sptrsv_schedule import build_level_schedule

    n = l.shape[0]
    sched = build_level_schedule(l)
    levels_of_row = jnp.asarray(sched.levels)
    from .retile import to_ell

    ell = to_ell(l)
    col = jnp.asarray(ell.col)
    val = jnp.asarray(ell.val)
    # mask the diagonal out of the ELL stream; gather inv diag
    rows_idx = np.arange(ell.col.shape[0]) % max(n, 1)
    is_diag = ell.col == np.arange(ell.col.shape[0])[:, None]
    val_off = jnp.asarray(np.where(is_diag, 0.0, ell.val))
    diag = np.ones(n, dtype=l.data.dtype)
    coo = l.tocoo()
    dm = coo.row == coo.col
    diag[coo.row[dm]] = coo.data[dm]
    inv_diag = jnp.asarray((1.0 / diag).astype(l.data.dtype))
    nlevels = sched.nlevels

    def solve(b):
        def body(lv, x):
            acc = jnp.sum(val_off * x[col], axis=1)[:n]
            xb = (b - acc) * inv_diag
            return jnp.where(levels_of_row == lv, xb, x[:n])

        x = jnp.zeros(n, dtype=b.dtype)
        # pad x by one zero slot for ELL pad gathers
        def body_pad(lv, xp):
            x = body(lv, xp)
            return jnp.concatenate([x, jnp.zeros(xp.shape[0] - n, x.dtype)])

        xp = jnp.zeros(max(ell.col.shape[0], n) + 1, dtype=b.dtype)
        xp = lax.fori_loop(0, nlevels, body_pad, xp)
        return xp[:n]

    return solve, nlevels


def bench_sptrsv(l: CSR, *, validate: bool = True, iters: int = 20,
                 compare_reference: bool = False,
                 tile_rows: int = 0) -> BenchRecord:
    n = l.shape[0]
    plan = SptrsvPlan(l, tile_rows=tile_rows)
    rng = np.random.default_rng(0)
    b0 = jnp.asarray(rng.standard_normal(n).astype(l.dtype))

    extra = {"nnz": l.nnz, "n": n, "nlevels": plan.nlevels,
             "tile_rows": plan.tile_rows,
             "padding_ratio": plan.padding_ratio,
             "dtype": str(np.dtype(l.dtype))}
    if validate:
        x = np.asarray(plan(b0))
        err = rel_err(x, sptrsv_golden(l, np.asarray(b0)))
        extra["rel_err"] = err
        tol = 1e-10 if l.dtype == np.float64 else 1e-3
        assert err < tol, f"validation failed: {err}"

    def step(b):
        x = plan.apply_traced(b)
        return b0 + _EPS * x

    per = measure_seconds_per_iter(step, b0, iters_lo=max(iters // 5, 2),
                                   iters_hi=iters)
    extra["levels_per_s"] = plan.nlevels / per
    rec = BenchRecord(
        name="sptrsv", seconds_per_iter=per, flops=2.0 * l.nnz,
        bytes=plan.bytes_per_iter, extra=extra,
    )
    if compare_reference:
        ref_solve, _ = sptrsv_reference_step(l)

        def ref_step(b):
            return b0 + _EPS * ref_solve(b)

        ref_per = measure_seconds_per_iter(ref_step, b0, iters_lo=2,
                                           iters_hi=6)
        rec.extra["jnp_reference_s"] = ref_per
        rec.extra["speedup_vs_jnp_reference"] = ref_per / per
    return rec


def bench_dist_spmv(a: CSR, mesh=None, *, strategy: str = "nnz_balanced",
                    validate: bool = True, iters: int = 25) -> BenchRecord:
    from .parallel import DistSpmvPlan, make_mesh

    mesh = mesh or make_mesh()
    m, n = a.shape
    plan = DistSpmvPlan(a, mesh, strategy=strategy)
    rng = np.random.default_rng(0)
    x0 = np.random.default_rng(0).standard_normal(n).astype(a.dtype)

    extra = {"strategy": strategy, "ndev": plan.ndev, "nnz": a.nnz, "m": m}
    if validate:
        y = np.asarray(plan(x0))
        err = rel_err(y, spmv_golden(a, x0))
        extra["rel_err"] = err
        assert err < default_tol(a.dtype), f"validation failed: {err}"

    # carry-dependent loop over the jitted sharded executor
    col, val = plan._col, plan._val
    run = plan._run
    x_pad0 = jnp.zeros(plan.n_pad, dtype=plan.dtype).at[:n].set(jnp.asarray(x0))
    x_pad0 = jax.device_put(x_pad0, plan._x_sharding)

    def step(x_pad):
        y = run(col, val, x_pad)
        return x_pad0 + _EPS * jnp.pad(y, (0, plan.n_pad - m))[: plan.n_pad]

    per = measure_seconds_per_iter(step, x_pad0, iters_lo=max(iters // 5, 2),
                                   iters_hi=iters)
    rec = BenchRecord(
        name=f"dist_spmv_{strategy}", seconds_per_iter=per,
        flops=2.0 * a.nnz, bytes=plan.bytes_per_iter, extra=extra,
    )
    return rec
