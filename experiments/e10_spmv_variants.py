"""Ablate the production w-SELL SpMV kernel on the REAL cant layout (TPU).

Round-3 context: int16 lcol halved the index stream, time/iter stayed ~98 us
=> kernel no longer HBM-bound (bf16 values confirm: same time at half the
val stream). This experiment isolates where the time goes by toggling one
component at a time on the production layout:

  base      exact production kernel (th=1024, wgroup=4, nwin=2, HIGHEST)
  prec_def  dot precision DEFAULT (1 MXU pass vs 3/6) [wrong by ~1e-3]
  no_dot    skip the segment dot entirely               [wrong results]
  no_gather skip take_along_axis (g = table)            [wrong results]
  no_scat   fixed output slab (no dynamic RMW)          [wrong results]
  one_win   single-window gather path on nwin=2 data    [wrong results]
  wg8       wgroup=8 packing
  th2048    th=2048 packing (1/2 the grid steps)
  th512     th=512 packing (2x the grid steps)

"wrong results" variants are time-ceilings only; we check base/prec_def/wg8/
th2048 against the golden.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from sblas import datasets
from sblas.golden import spmv_golden, rel_err
from sblas.retile_wsell import pack_wsell, SUBLANES, LANES
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

P = lambda *a: print(*a, flush=True)


def make_kernel(th, sub, wgroup, *, precision, do_dot=True, do_gather=True,
                do_scatter=True, one_win=False):
    lps = LANES // sub
    ns = th // SUBLANES
    ngrp = ns // wgroup
    gh = wgroup * SUBLANES

    def kern(wrow_ref, obase_ref, x2d_ref, val_ref, col_ref, out_ref):
        t = pl.program_id(0)
        seg = (jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 0) // lps
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 1)
               ).astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for q in range(ngrp):
            w = wrow_ref[t * ns + q * wgroup]
            v = val_ref[q * gh:(q + 1) * gh, :].astype(jnp.float32)
            c = col_ref[q * gh:(q + 1) * gh, :].astype(jnp.int32)
            xw = x2d_ref[pl.ds(w, 1), :]
            table = jnp.broadcast_to(xw, (gh, 128))
            if not do_gather:
                g = table
            elif one_win:
                g = jnp.take_along_axis(table, jnp.minimum(c, 127), axis=1)
            else:
                xw1 = x2d_ref[pl.ds(w + 1, 1), :]
                table1 = jnp.broadcast_to(xw1, (gh, 128))
                g0 = jnp.take_along_axis(table, jnp.minimum(c, 127), axis=1)
                g1 = jnp.take_along_axis(table1, jnp.maximum(c - 128, 0),
                                         axis=1)
                g = jnp.where(c < 128, g0, g1)
            if do_dot:
                part = jnp.dot(v * g, seg,
                               preferred_element_type=jnp.float32,
                               precision=precision)
            else:
                part = (v * g)[:, :sub]
            for j in range(wgroup):
                if do_scatter:
                    b = obase_ref[t * ns + q * wgroup + j]
                else:
                    b = 0
                slab = b * SUBLANES
                cur = out_ref[pl.ds(slab, SUBLANES), :]
                out_ref[pl.ds(slab, SUBLANES), :] = (
                    cur + part[j * SUBLANES:(j + 1) * SUBLANES]
                )

    return kern


def build_call(w, kern):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(w.num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w.y_rows, w.sub), jnp.float32),
    )


def main():
    a = datasets.emulate("cant", dtype=np.float32)
    x = np.random.default_rng(0).standard_normal(a.shape[1]).astype(np.float32)
    gold = spmv_golden(a, x)
    sbw = stream_bandwidth()
    P(f"# STREAM {sbw:.1f} GB/s  nnz={a.nnz}")

    layouts = {}

    def layout(th, wgroup):
        key = (th, wgroup)
        if key not in layouts:
            layouts[key] = pack_wsell(a, th=th, wgroup=wgroup, cache=False)
        return layouts[key]

    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT
    cases = [
        ("base", 1024, 4, dict(precision=HI), True),
        ("prec_def", 1024, 4, dict(precision=DE), True),
        ("no_dot", 1024, 4, dict(precision=HI, do_dot=False), False),
        ("no_gather", 1024, 4, dict(precision=HI, do_gather=False), False),
        ("no_scat", 1024, 4, dict(precision=HI, do_scatter=False), False),
        ("one_win", 1024, 4, dict(precision=HI, one_win=True), False),
        ("wg8", 1024, 8, dict(precision=HI), True),
        ("wg8_def", 1024, 8, dict(precision=DE), True),
        ("th2048", 2048, 4, dict(precision=HI), True),
        ("th512", 512, 4, dict(precision=HI), True),
        ("th2048_wg8", 2048, 8, dict(precision=HI), True),
    ]
    for name, th, wg, opts, check in cases:
        try:
            w = layout(th, wg)
            kern = make_kernel(w.th, w.sub, w.wgroup, **opts)
            call = build_call(w, kern)
            val = jnp.asarray(w.val)
            lcol = jnp.asarray(w.lcol)
            wr = jnp.asarray(w.round_wrow)
            ob = jnp.asarray(w.round_obase)
            pad = w.x2d_rows * 128 - a.shape[1]

            def step(x1, wr, ob, val, lcol):
                x2d = jnp.pad(x1, (0, pad)).reshape(-1, 128)
                return call(wr, ob, x2d, val, lcol)

            y = np.asarray(jax.jit(step)(x, wr, ob, val, lcol))
            err = rel_err(y.reshape(-1)[:a.shape[0]], gold) if check else -1.0
            per = measure_seconds_per_iter(
                lambda x1, wr, ob, val, lcol:
                    x1 + step(x1, wr, ob, val, lcol)[0, 0] * 1e-30,
                jnp.asarray(x), wr, ob, val, lcol,
                iters_lo=8, iters_hi=32, repeats=2)
            by = w.bytes_per_iter + a.shape[1] * 4 + a.shape[0] * 4
            P(f"{name:12s} th={th:4d} wg={wg} fill={w.fill:.3f} "
              f"{per*1e6:7.1f} us  {by/per/1e9:6.1f} GB/s "
              f"({100*by/per/1e9/sbw:5.1f}% of STREAM)  err={err:.2e}")
        except Exception as e:
            P(f"{name:12s} FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
