"""Benchmark drivers shared by the CLI and the top-level bench.py
(layer L5, SURVEY.md C14).

Each bench builds a plan, wraps it in a carry-dependent step (so the timing
harness's fori_loop cannot elide or reorder iterations), measures marginal
seconds/iteration, and reports GFLOP/s, GB/s (from the plan's explicit bytes
model) and % of measured STREAM bandwidth — the BASELINE.md north-star.

All device arrays flow through explicit jit arguments (plan.device_arrays()
+ plan.apply_pure) — closure capture would embed them as HLO constants,
which is pathologically slow on the axon remote-compile path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .formats import CSR
from .golden import (spmv_golden, spmm_golden, sptrsv_golden, sptrsm_golden,
                     rel_err, default_tol)
from .ops.spmv import SpmvPlan
from .ops.spmm import SpmmPlan
from .ops.sptrsv import SptrsvPlan
from .ops.sptrsm import SptrsmPlan
from .utils.timing import BenchRecord, measure_seconds_per_iter, stream_bandwidth

# Keeps the carry numerically equal to x0 while forcing a data dependency on
# the previous iteration's output (tiny*y underflows against x0).
_EPS = 1e-30


def _attach_stream(rec: BenchRecord) -> None:
    if "pct_stream" in rec.extra:
        # the interleaved ratio protocol already set pct/stream from its
        # median pair — keep those, only derive the effective-BW fields
        sbw = rec.extra["stream_gbps"]
    else:
        sbw = stream_bandwidth()
        rec.extra["stream_gbps"] = sbw
        rec.extra["pct_stream"] = 100.0 * rec.gbps / sbw
    # Padded layouts stream padding slots at kernel rate; gbps counts those
    # streamed bytes (a saturation proof), but the USEFUL bandwidth is gbps
    # x fill — report both so a 100%-of-STREAM row at fill 0.47 cannot read
    # as optimal (VERDICT r2 weak #5: uk-2002-full). Fill is the entire
    # optimization headroom on low-fill packs.
    fill = rec.extra.get("fill")
    if fill is not None and fill < 0.999:
        rec.extra["effective_gbps"] = rec.gbps * fill
        rec.extra["pct_stream_effective"] = 100.0 * rec.gbps * fill / sbw


def bench_spmv(a: CSR, *, method: str = "auto", validate: bool = True,
               iters: int = 25, with_stream_pct: bool = True,
               value_dtype=None, ratio_pairs: int = 0,
               geometry=None) -> BenchRecord:
    """One SpMV benchmark record.

    ``ratio_pairs=N`` (N>1) switches pct_stream to the interleaved ratio
    protocol: N back-to-back (kernel, fresh STREAM) sample pairs, report the
    median of the per-pair ratios and that pair's absolute numbers.  A lone
    kernel sample divided by a process-cached STREAM mixes two statistics
    taken minutes apart on a chip whose effective clock wobbles ±3-7%
    (e27); pairing cancels the common mode, and using the SAME marginal-min
    statistic on both sides removes the numerator/denominator asymmetry
    that made the r8/r9 pdb1HYS rows straddle the 80% bar (VERDICT r2
    item 5a)."""
    m, n = a.shape
    if m != n:
        raise ValueError("bench uses square matrices (carry feedback)")
    with jax.profiler.TraceAnnotation("retile"):
        plan = SpmvPlan(a, method, value_dtype=value_dtype,
                        geometry=geometry)
    rng = np.random.default_rng(0)
    with jax.profiler.TraceAnnotation("H2D"):
        x0 = jnp.asarray(rng.standard_normal(n).astype(a.dtype))

    extra = {"method": plan.method, "nnz": a.nnz, "m": m,
             "dtype": str(np.dtype(a.dtype)),
             "fill": getattr(plan, "fill", 1.0)}
    if geometry:
        extra["geometry"] = dict(geometry)
    tol = default_tol(a.dtype)
    if value_dtype is not None:
        extra["value_dtype"] = str(np.dtype(value_dtype))
        tol = max(tol, default_tol(value_dtype))
    if validate:
        y = np.asarray(plan(x0))
        # upcast x to the matrix dtype: under x64-off jnp silently holds x0
        # in f32, and a golden computed AT f32 makes a f64-class validation
        # meaningless (caught by the pallas_ds path: the "error" was the
        # reference's rounding). f32 -> f64 is exact, so this is consistent
        # for every method.
        err = rel_err(y, spmv_golden(a, np.asarray(x0, dtype=a.dtype)))
        extra["rel_err"] = err
        assert err < tol, f"validation failed: {err}"

    if plan.method == "pseg":
        # scattered fast path: iterate in hub-relabeled space (permutation
        # applied once outside the loop; same precedent as bench_sptrsv's
        # host-side permutes — noted in the record)
        ps = plan._pallas
        x0 = x0[jnp.asarray(ps.colperm)]
        extra["permutes"] = "amortized (hub-relabeled space)"
        extra["stragglers"] = ps.layout.n_stragglers

        def step(x, arrs, x0):
            return x0 + _EPS * ps.apply_permuted(arrs, x)
    elif plan.method == "rcm":
        # same precedent: iterate in RCM-reordered space
        x0 = x0[plan._rcm_perm]
        extra["permutes"] = "amortized (rcm-reordered space)"

        def step(x, arrs, x0):
            return x0 + _EPS * plan.apply_permuted(arrs, x)
    elif plan.method == "pallas_ds":
        # double-single: the carry is the (hi, lo) plane pair; feedback adds
        # per-plane (no renormalization — timing only, validated above)
        ps = plan._pallas
        xh, xl = ps.split_x(np.asarray(x0, dtype=np.float64))
        x0 = (jnp.asarray(xh), jnp.asarray(xl))

        def step(x, arrs, x0):
            yh, yl = ps.apply_pure(arrs, x[0], x[1])
            return (x0[0] + _EPS * yh, x0[1] + _EPS * yl)
    else:
        def step(x, arrs, x0):
            return x0 + _EPS * plan.apply_pure(arrs, x)

    feedback_bytes = 2 * n * a.data.itemsize
    nbytes = plan.bytes_per_iter + feedback_bytes
    if ratio_pairs > 1:
        pairs = []
        for _ in range(ratio_pairs):
            with jax.profiler.TraceAnnotation("kernel"):
                per = measure_seconds_per_iter(
                    step, x0, plan.device_arrays(), x0,
                    iters_lo=max(iters // 5, 2), iters_hi=iters)
            sbw = stream_bandwidth(fresh=True)
            pairs.append((nbytes / per / 1e9 / sbw, per, sbw))
        pairs.sort()
        ratio, per, sbw = pairs[len(pairs) // 2]
        extra["protocol"] = f"ratio-median-of-{ratio_pairs}"
        extra["ratio_pairs"] = [
            {"pct": round(100 * r, 2), "us": round(p * 1e6, 2),
             "stream_gbps": round(s, 1)} for r, p, s in pairs]
        extra["stream_gbps"] = sbw
        extra["pct_stream"] = 100.0 * ratio
    else:
        with jax.profiler.TraceAnnotation("kernel"):
            per = measure_seconds_per_iter(step, x0, plan.device_arrays(),
                                           x0, iters_lo=max(iters // 5, 2),
                                           iters_hi=iters)
    rec = BenchRecord(
        name="spmv", seconds_per_iter=per, flops=2.0 * a.nnz,
        bytes=nbytes, extra=extra,
    )
    if with_stream_pct:
        _attach_stream(rec)
    return rec


def bench_spmm(a: CSR, k: int = 8, *, method: str = "auto",
               validate: bool = True, iters: int = 25,
               with_stream_pct: bool = True, value_dtype=None,
               ratio_pairs: int = 0) -> BenchRecord:
    """One SpMM benchmark record. ``ratio_pairs=N`` (N>1) applies the same
    interleaved (kernel, fresh STREAM) median-of-pairs protocol as
    bench_spmv (VERDICT r3 item 8: large rows inherit drift immunity)."""
    m, n = a.shape
    if m != n:
        raise ValueError("bench uses square matrices")
    with jax.profiler.TraceAnnotation("retile"):
        plan = SpmmPlan(a, method, value_dtype=value_dtype, k_hint=k)
    rng = np.random.default_rng(0)
    if plan.method == "pallas_ds":
        # double-single f64-class SpMM: numpy f64 boundary, two-plane carry
        xnp = rng.standard_normal((n, k))
        extra = {"method": plan.method, "nnz": a.nnz, "m": m, "k": k,
                 "dtype": "float64"}
        if validate:
            y = plan(xnp)
            err = rel_err(y, spmm_golden(a, xnp))
            extra["rel_err"] = err
            assert err < 1e-10, f"validation failed: {err}"
        xh = xnp.astype(np.float32)
        xl = (xnp - xh.astype(np.float64)).astype(np.float32)
        x0p = (jnp.asarray(xh), jnp.asarray(xl))

        def step(x, arrs, x0):
            yh, yl = plan.apply_planes(arrs, x[0], x[1])
            return (x0[0] + _EPS * yh, x0[1] + _EPS * yl)

        per = measure_seconds_per_iter(step, x0p, plan.device_arrays(), x0p,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
        rec = BenchRecord(
            name=f"spmm_k{k}", seconds_per_iter=per, flops=2.0 * a.nnz * k,
            bytes=plan.bytes_per_iter_nx + (m + 3 * n) * k * 8, extra=extra,
        )
        if with_stream_pct:
            _attach_stream(rec)
        return rec
    with jax.profiler.TraceAnnotation("H2D"):
        x0 = jnp.asarray(rng.standard_normal((n, k)).astype(a.dtype))
    if plan._csr is not None:
        # the bench drives plan.apply_pure directly (no __call__ fallback
        # wrapper), so resolve the per-k fallback up front: eval_shape
        # traces apply_pure, firing the host-side VMEM/unroll guards
        # without touching the device
        try:
            jax.eval_shape(plan.apply_pure, plan.device_arrays(), x0)
        except (ValueError, RuntimeError):
            plan = plan._fallback_for(k)

    extra = {"method": plan.method, "nnz": a.nnz, "m": m, "k": k,
             "dtype": str(np.dtype(a.dtype))}
    if plan.route_reason is not None:
        extra["route_reason"] = plan.route_reason
    tol = default_tol(a.dtype)
    if value_dtype is not None:
        extra["value_dtype"] = str(np.dtype(value_dtype))
        tol = max(tol, default_tol(value_dtype))
    x_t = x0
    if plan.method == "pseg":
        # scattered fast path: iterate in hub-relabeled space (same
        # precedent as bench_spmv/bench_sptrsv; noted in the record)
        ps = plan._pallas
        extra["kres"] = bool(getattr(ps, "_kres", False))
        x_t = x0[jnp.asarray(ps.colperm), :]
        extra["permutes"] = "amortized (hub-relabeled space)"

        def step(x, arrs, x0):
            return x0 + _EPS * ps.apply_permuted(arrs, x)
    elif (plan.method == "spmv_passes"
          and getattr(plan._spmv, "method", "") == "pseg"):
        # cost-routed passes over the pseg SpMV: same permuted-space
        # protocol as the pseg branch, so the committed row matches the
        # k-passes bound's statistic (the SpMV row is measured permuted)
        x_t = x0[jnp.asarray(plan._spmv._pallas.colperm), :]
        extra["permutes"] = "amortized (hub-relabeled space)"

        def step(x, arrs, x0):
            return x0 + _EPS * plan.apply_permuted(arrs, x)
    else:
        def step(x, arrs, x0):
            return x0 + _EPS * plan.apply_pure(arrs, x)

    if plan._csr is not None:
        # Probe-compile the exact timed path before validating/measuring:
        # Mosaic compile failures (axon remote-compile HTTP 500) surface
        # only at the first compile of THIS executable — eval_shape fires
        # host guards but never reaches Mosaic, and plan(x0)'s internal
        # fallback protects a DIFFERENT traced path (the r8 powerlaw-1M
        # kres loss). Degrade exactly like SpmmPlan.__call__ does.
        try:
            jax.block_until_ready(
                jax.jit(step)(x_t, plan.device_arrays(), x_t))
        except RuntimeError:
            plan = plan._fallback_for(k)
            extra["method"] = plan.method
            extra["fallback"] = "mosaic-compile"
            extra.pop("kres", None)
            extra.pop("permutes", None)
            x_t = x0

            def step(x, arrs, x0):
                return x0 + _EPS * plan.apply_pure(arrs, x)

    lay = getattr(getattr(plan, "_pallas", None), "layout", None)
    if getattr(lay, "fill", None) is not None:
        extra["fill"] = lay.fill
    if validate:
        y = np.asarray(plan(x0))
        err = rel_err(y, spmm_golden(a, np.asarray(x0)))
        extra["rel_err"] = err
        assert err < tol, f"validation failed: {err}"

    x_traffic = n * k * a.data.itemsize
    feedback = 2 * n * k * a.data.itemsize
    nbytes = (plan.bytes_per_iter_nx + m * k * a.data.itemsize + x_traffic
              + feedback)
    if ratio_pairs > 1:
        pairs = []
        for _ in range(ratio_pairs):
            with jax.profiler.TraceAnnotation("kernel"):
                per = measure_seconds_per_iter(
                    step, x_t, plan.device_arrays(), x_t,
                    iters_lo=max(iters // 5, 2), iters_hi=iters)
            sbw = stream_bandwidth(fresh=True)
            pairs.append((nbytes / per / 1e9 / sbw, per, sbw))
        pairs.sort()
        ratio, per, sbw = pairs[len(pairs) // 2]
        extra["protocol"] = f"ratio-median-of-{ratio_pairs}"
        extra["ratio_pairs"] = [
            {"pct": round(100 * r, 2), "us": round(p * 1e6, 2),
             "stream_gbps": round(s, 1)} for r, p, s in pairs]
        extra["stream_gbps"] = sbw
        extra["pct_stream"] = 100.0 * ratio
    else:
        with jax.profiler.TraceAnnotation("kernel"):
            per = measure_seconds_per_iter(
                step, x_t, plan.device_arrays(), x_t,
                iters_lo=max(iters // 5, 2), iters_hi=iters)
    rec = BenchRecord(
        name=f"spmm_k{k}", seconds_per_iter=per, flops=2.0 * a.nnz * k,
        bytes=nbytes,
        extra=extra,
    )
    if with_stream_pct:
        _attach_stream(rec)
    return rec


def sptrsv_reference_pure(l: CSR):
    """The naive jnp masked-wavefront solver (BASELINE config #3's '>=10x
    over pure-jnp loop' baseline): per level, recompute the full residual and
    update only that level's rows — O(nlevels * nnz) work, no schedule.

    Returns (solve(arrs, b), arrs, nlevels)."""
    from .sptrsv_schedule import build_level_schedule
    from .retile import to_ell

    n = l.shape[0]
    sched = build_level_schedule(l)
    ell = to_ell(l)
    is_diag = ell.col == np.arange(ell.col.shape[0])[:, None]
    diag = np.ones(n, dtype=l.data.dtype)
    coo = l.tocoo()
    dm = coo.row == coo.col
    diag[coo.row[dm]] = coo.data[dm]
    nlevels = sched.nlevels
    mp = ell.col.shape[0]

    arrs = {
        "col": jnp.asarray(ell.col),
        "val_off": jnp.asarray(np.where(is_diag, 0.0, ell.val).astype(l.data.dtype)),
        "inv_diag": jnp.asarray((1.0 / diag).astype(l.data.dtype)),
        "levels": jnp.asarray(sched.levels),
    }

    def solve(arrs, b):
        def body(lv, x):
            acc = jnp.sum(arrs["val_off"] * x[arrs["col"]], axis=1)[:n]
            xb = (b - acc) * arrs["inv_diag"]
            xn = jnp.where(arrs["levels"] == lv, xb, x[:n])
            return jnp.concatenate([xn, jnp.zeros(mp - n + 1, xn.dtype)]) \
                if mp + 1 > n else xn

        xp = jnp.zeros(max(mp, n) + 1, dtype=b.dtype)
        xp = lax.fori_loop(0, nlevels, body, xp)
        return xp[:n]

    return solve, arrs, nlevels


def bench_sptrsv(l: CSR, *, validate: bool = True, iters: int = 20,
                 compare_reference: bool = False,
                 tile_rows: int = 0, method: str = "auto",
                 sweeps: int | None = None) -> BenchRecord:
    n = l.shape[0]
    if method == "jacobi":
        from .ops.sptrsv_iter import SptrsvJacobiPlan

        plan = SptrsvJacobiPlan(l, sweeps=sweeps)
    else:
        plan = SptrsvPlan(l, tile_rows=tile_rows, method=method)
    rng = np.random.default_rng(0)
    b0 = jnp.asarray(rng.standard_normal(n).astype(l.dtype))

    extra = {"nnz": l.nnz, "n": n, "nlevels": plan.nlevels,
             "method": plan.method,
             "dtype": str(np.dtype(l.dtype))}
    if method == "jacobi":
        extra["sweeps"] = plan.sweeps
    else:
        extra["tile_rows"] = plan.tile_rows
        extra["padding_ratio"] = plan.padding_ratio
    if validate:
        x = np.asarray(plan(b0))
        # upcast b to the matrix dtype for the golden (exact for f32->f64):
        # sptrsv_golden rounds its result back to b's dtype, and a golden
        # rounded to f32 caps any f64-class validation at 2e-8 (same
        # pitfall bench_spmv documents)
        err = rel_err(x, sptrsv_golden(l, np.asarray(b0, dtype=l.dtype)))
        extra["rel_err"] = err
        exact = method != "jacobi" or plan.sweeps >= plan.nlevels - 1
        if exact:
            tol = 1e-10 if l.dtype == np.float64 else 1e-3
            assert err < tol, f"validation failed: {err}"
        # truncated jacobi: rel_err is the reported approximation quality

    if getattr(plan, "method", "") == "pallas_ds":
        # f64-class refinement chain: initial f32 wavefront solve +
        # refine_iters x (ds residual SpMV + correction solve), one jit;
        # b permutation/split host-side as in the pallas branch
        p = plan._pallas
        arrs = p.device_arrays()
        bh, bl = p.b_to_planes(np.asarray(b0, dtype=np.float64))
        planes0 = (jnp.asarray(bh), jnp.asarray(bl))
        extra["refine_iters"] = p.refine_iters
        extra["ds_spmv_fill"] = p._ds.layout.fill

        def step(carry, arrs, planes0):
            xh, _xl = p.solve_planes(arrs, planes0[0] + carry * _EPS,
                                     planes0[1])
            return jnp.float32(_EPS) * xh[0]

        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, planes0,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
        extra["permutes"] = "host-side"
    elif getattr(plan, "method", "") == "pallas":
        # measure the on-chip wavefront solve only; the level permutation of
        # b/x is host-side (XLA device gathers are ~1 GB/s on TPU, DESIGN.md)
        p = plan._pallas
        arrs = p.device_arrays()
        b2d0 = jnp.asarray(p.b_to_b2d(np.asarray(b0)))

        def step(carry, arrs, b2d0):
            x2d = p.solve_permuted(arrs, b2d0 + carry * _EPS)
            return jnp.float32(_EPS) * x2d[0, 0]

        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, b2d0,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
        extra["permutes"] = "host-side"
    else:
        def step(b, arrs, b0):
            return b0 + _EPS * plan.apply_pure(arrs, b)

        per = measure_seconds_per_iter(step, b0, plan.device_arrays(), b0,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
    extra["levels_per_s"] = plan.nlevels / per
    rec = BenchRecord(
        name="sptrsv", seconds_per_iter=per, flops=2.0 * l.nnz,
        bytes=plan.bytes_per_iter, extra=extra,
    )
    if compare_reference:
        ref_solve, ref_arrs, _ = sptrsv_reference_pure(l)

        def ref_step(b, arrs, b0):
            return b0 + _EPS * ref_solve(arrs, b)

        ref_per = measure_seconds_per_iter(ref_step, b0, ref_arrs, b0,
                                           iters_lo=2, iters_hi=6)
        rec.extra["jnp_reference_s"] = ref_per
        rec.extra["speedup_vs_jnp_reference"] = ref_per / per
    return rec


def bench_sptrsm(l: CSR, k: int = 8, *, validate: bool = True,
                 iters: int = 15, method: str = "auto") -> BenchRecord:
    """Multi-RHS triangular solve; one analysis amortized over k columns."""
    n = l.shape[0]
    if method == "pallas_ds":
        # f64-class: lanes wavefront (8 RHS/pass) + slot-space ds
        # refinement; measure the jitted refine chain for ONE 8-RHS chunk
        # (k > 8 is ceil(k/8) identical chunks, priced in bytes)
        from .ops.kernels.sptrsv_ds import PallasSptrsmDS

        plan = PallasSptrsmDS(l)
        if k > plan.MAX_RHS:
            raise ValueError("ds bench measures one chunk; use k <= 8")
        rng = np.random.default_rng(0)
        b0 = rng.standard_normal((n, k))
        extra = {"nnz": l.nnz, "n": n, "k": k, "nlevels": plan.nlevels,
                 "method": "pallas_ds", "dtype": "float64",
                 "refine_iters": plan.refine_iters,
                 "ds_spmv_fill": plan._ds.layout.fill,
                 "permutes": "host-side"}
        if validate:
            x = plan(b0)
            err = rel_err(x, sptrsm_golden(l, b0))
            extra["rel_err"] = err
            assert err < 1e-10, f"validation failed: {err}"
        bh, bl = plan.b_to_planes(b0)
        planes0 = (jnp.asarray(bh), jnp.asarray(bl))
        arrs = plan.device_arrays()

        def step(carry, arrs, planes0):
            xh, _xl = plan.solve_planes(arrs, planes0[0] + carry * _EPS,
                                        planes0[1])
            return jnp.float32(_EPS) * xh[0, 0]

        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, planes0,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
        extra["levels_per_s"] = plan.nlevels / per
        return BenchRecord(
            name=f"sptrsm_k{k}", seconds_per_iter=per,
            flops=2.0 * l.nnz * k, bytes=plan.bytes_per_iter, extra=extra,
        )
    plan = SptrsmPlan(l)
    rng = np.random.default_rng(0)
    b0 = jnp.asarray(rng.standard_normal((n, k)).astype(l.dtype))

    extra = {"nnz": l.nnz, "n": n, "k": k, "nlevels": plan.nlevels,
             "padding_ratio": plan.padding_ratio, "method": plan.method,
             "dtype": str(np.dtype(l.dtype))}
    if validate:
        x = np.asarray(plan(b0))
        err = rel_err(x, sptrsm_golden(l, np.asarray(b0)))
        extra["rel_err"] = err
        tol = 1e-10 if l.dtype == np.float64 else 1e-3
        assert err < tol, f"validation failed: {err}"

    if (plan.method == "pallas" and k >= plan.LANES_MIN_K
            and plan._get_lanes() is not None):
        # RHS-on-sublanes kernel: one schedule pass per 8-RHS chunk
        pl_ = plan._lanes
        arrs = pl_.device_arrays()
        chunks = [
            jnp.asarray(pl_.b_to_b3d(
                np.asarray(b0[:, c0:c0 + pl_.MAX_RHS], np.float32)))
            for c0 in range(0, k, pl_.MAX_RHS)
        ]
        b3s = jnp.stack(chunks)
        extra["kernel"] = "lanes"
        extra["rounds"] = int(pl_.layout.num_tiles * pl_.layout.th)

        def step(carry, arrs, b3s):
            x = lax.map(lambda b3: plan._lanes.solve_permuted(arrs, b3),
                        b3s + carry * _EPS)
            return jnp.float32(_EPS) * x[0, 0, 0]

        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, b3s,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
        extra["permutes"] = "host-side"
        extra["levels_per_s"] = plan.nlevels / per
        return BenchRecord(
            name=f"sptrsm_k{k}", seconds_per_iter=per,
            flops=2.0 * l.nnz * k, bytes=plan.bytes_per_iter(k),
            extra=extra,
        )
    if plan.method == "pallas":
        # measure the on-chip batched wavefront (host-side permutes, as in
        # bench_sptrsv): chunks of the lane-parallel multi-RHS kernel at the
        # chunk width the plan settled on (a first solve settles it)
        p = plan._sv._pallas
        lay = p.layout
        arrs = p.device_arrays()
        if plan._kc is None:
            plan(b0)
        kc = plan._kc or 1
        kp = -(-k // kc) * kc
        b_pad = np.zeros((lay.num_blocks * 128, kp), dtype=np.float32)
        b_pad[np.asarray(lay.slot_of_row), :k] = np.asarray(
            b0, dtype=np.float32)
        b2dk0 = jnp.asarray(
            (b_pad.T.reshape(kp, -1, 16)
             * np.asarray(lay.inv_diag)[None]).reshape(
                kp // kc, kc, -1, 16)
        )
        extra["chunk_width"] = kc

        def step(carry, arrs, chunks):
            x = lax.map(lambda bk: p.solve_permuted_multi(arrs, bk),
                        chunks + carry * _EPS)
            return jnp.float32(_EPS) * x[0, 0, 0, 0]

        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, b2dk0,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
        extra["permutes"] = "host-side"
    else:
        def step(b, arrs, b0):
            return b0 + _EPS * plan.apply_pure(arrs, b)

        per = measure_seconds_per_iter(step, b0, plan.device_arrays(), b0,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
    extra["levels_per_s"] = plan.nlevels / per
    return BenchRecord(
        name=f"sptrsm_k{k}", seconds_per_iter=per, flops=2.0 * l.nnz * k,
        bytes=plan.bytes_per_iter(k), extra=extra,
    )


def bench_dist_spmv(a: CSR, mesh=None, *, strategy: str = "nnz_balanced",
                    validate: bool = True, iters: int = 25) -> BenchRecord:
    from .parallel import DistSpmvPlan, make_mesh

    mesh = mesh or make_mesh()
    m, n = a.shape
    with jax.profiler.TraceAnnotation("retile"):
        plan = DistSpmvPlan(a, mesh, strategy=strategy)
    x0 = np.random.default_rng(0).standard_normal(n).astype(a.dtype)

    extra = {"strategy": strategy, "ndev": plan.ndev, "nnz": a.nnz, "m": m,
             "local_method": plan.local_method}
    if validate:
        y = np.asarray(plan(x0))
        err = rel_err(y, spmv_golden(a, x0))
        extra["rel_err"] = err
        assert err < default_tol(a.dtype), f"validation failed: {err}"

    if plan.local_method == "pallas":
        run = plan._run_pallas
        arrs = (plan._wr, plan._ob, plan._val, plan._lcol)
    elif plan.local_method == "pseg":
        # scattered dist fast path: iterate in hub-relabeled space (the
        # plan's __call__ permutes x host-side before padding)
        run = plan._run_pseg
        arrs = (plan._pwr, plan._pob, plan._pval, plan._plcol, plan._ptsb,
                plan._psrow, plan._pscol, plan._psval)
        x0 = jnp.asarray(np.asarray(x0)[plan._pseg_colperm])
        extra["permutes"] = "amortized (hub-relabeled space)"
    else:
        run = plan._run
        arrs = (plan._col, plan._val)
    with jax.profiler.TraceAnnotation("H2D"):
        x_pad0 = jnp.zeros(plan.n_pad,
                           dtype=plan.dtype).at[:n].set(jnp.asarray(x0))
        x_pad0 = jax.device_put(x_pad0, plan._x_sharding)
    n_pad = plan.n_pad

    def step(x_pad, *rest):
        y = run(*rest[:-1], x_pad)
        return rest[-1] + _EPS * jnp.pad(y, (0, n_pad - m))[:n_pad]

    with jax.profiler.TraceAnnotation("kernel"):
        per = measure_seconds_per_iter(step, x_pad0, *arrs, x_pad0,
                                       iters_lo=max(iters // 5, 2),
                                       iters_hi=iters)
    rec = BenchRecord(
        name=f"dist_spmv_{strategy}", seconds_per_iter=per,
        flops=2.0 * a.nnz, bytes=plan.bytes_per_iter, extra=extra,
    )
    return rec
