"""SpMV w-SELL: replace the MXU segment-dot with lane-butterfly rolls.

e10 measured the HIGHEST segment dot at ~21 us of the 98 us iteration
(DEFAULT precision recovers 18 us but costs 1.9e-3 error). The segment sum
of lps=8 lanes is exactly computable on the VPU with 3 static rolls + adds:

    t1[l] = vg[l] + vg[l+4];  t2[l] = t1[l] + t1[l+2];  t3[l] = t2[l]+t2[l+1]
    => t3[8j] = sum(vg[8j:8j+8])   (lane 8j = segment j's sum, exact f32)

Two compaction strategies for the garbage lanes:
  roll_wide   y lives (y_rows, 128) in VMEM, RMW full (8,128) slabs; the
              every-8th-lane extraction happens once in XLA outside.
  roll_gather one extra take_along_axis(t3, 8*(l%16)) pulls the 16 segment
              sums into lanes 0..15 duplicated; RMW writes lanes :16.

Both exact; compare against e10 base (98.2 us) / no_dot ceiling (77.3 us).
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


def make_kernel(th, sub, wgroup, mode):
    lps = LANES // sub
    ns = th // SUBLANES
    ngrp = ns // wgroup
    gh = wgroup * SUBLANES

    def kern(wrow_ref, obase_ref, x2d_ref, val_ref, col_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for q in range(ngrp):
            w = wrow_ref[t * ns + q * wgroup]
            v = val_ref[q * gh:(q + 1) * gh, :].astype(jnp.float32)
            c = col_ref[q * gh:(q + 1) * gh, :].astype(jnp.int32)
            xw = x2d_ref[pl.ds(w, 1), :]
            table = jnp.broadcast_to(xw, (gh, 128))
            xw1 = x2d_ref[pl.ds(w + 1, 1), :]
            table1 = jnp.broadcast_to(xw1, (gh, 128))
            g0 = jnp.take_along_axis(table, jnp.minimum(c, 127), axis=1)
            g1 = jnp.take_along_axis(table1, jnp.maximum(c - 128, 0), axis=1)
            vg = v * jnp.where(c < 128, g0, g1)
            # butterfly: lane 8j accumulates its 8-lane segment exactly
            # pltpu.roll requires shift >= 0; roll(x, 128-s)[l] = x[l+s]
            s = lps
            while s > 1:
                s //= 2
                vg = vg + pltpu.roll(vg, 128 - s, 1)
            if mode == "roll_gather":
                idx = jax.lax.broadcasted_iota(jnp.int32, (gh, 128), 1)
                part = jnp.take_along_axis(vg, (idx % sub) * lps, axis=1)
                for j in range(wgroup):
                    b = obase_ref[t * ns + q * wgroup + j]
                    slab = b * SUBLANES
                    cur = out_ref[pl.ds(slab, SUBLANES), :]
                    out_ref[pl.ds(slab, SUBLANES), :] = (
                        cur + part[j * SUBLANES:(j + 1) * SUBLANES, :sub]
                    )
            else:
                for j in range(wgroup):
                    b = obase_ref[t * ns + q * wgroup + j]
                    slab = b * SUBLANES
                    cur = out_ref[pl.ds(slab, SUBLANES), :]
                    out_ref[pl.ds(slab, SUBLANES), :] = (
                        cur + vg[j * SUBLANES:(j + 1) * SUBLANES]
                    )

    return kern


def main():
    a = datasets.emulate("cant", dtype=np.float32)
    x = np.random.default_rng(0).standard_normal(a.shape[1]).astype(np.float32)
    gold = spmv_golden(a, x)
    sbw = stream_bandwidth()
    P(f"# STREAM {sbw:.1f} GB/s  nnz={a.nnz}")

    for name, th, wg, mode in [
        ("roll_wide", 1024, 4, "roll_wide"),
        ("roll_gather", 1024, 4, "roll_gather"),
        ("roll_wide8", 1024, 8, "roll_wide"),
    ]:
        try:
            w = pack_wsell(a, th=th, wgroup=wg, cache=False)
            out_w = 128 if mode == "roll_wide" else w.sub
            kern = make_kernel(w.th, w.sub, w.wgroup, mode)
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
            call = pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((w.y_rows, out_w), jnp.float32),
            )
            val = jnp.asarray(w.val)
            lcol = jnp.asarray(w.lcol)
            wr = jnp.asarray(w.round_wrow)
            ob = jnp.asarray(w.round_obase)
            pad = w.x2d_rows * 128 - a.shape[1]
            lps = LANES // w.sub

            def step(x1, wr, ob, val, lcol):
                x2d = jnp.pad(x1, (0, pad)).reshape(-1, 128)
                y2 = call(wr, ob, x2d, val, lcol)
                if mode == "roll_wide":
                    y2 = y2.reshape(w.y_rows, w.sub, lps)[:, :, 0]
                return y2

            y = np.asarray(jax.jit(step)(x, wr, ob, val, lcol))
            err = rel_err(y.reshape(-1)[:a.shape[0]], gold)
            per = measure_seconds_per_iter(
                lambda x1, wr, ob, val, lcol:
                    x1 + step(x1, wr, ob, val, lcol)[0, 0] * 1e-30,
                jnp.asarray(x), wr, ob, val, lcol,
                iters_lo=8, iters_hi=32, repeats=2)
            extra_y = (w.y_rows * 128 * 8 + a.shape[0] * 4
                       if mode == "roll_wide" else a.shape[0] * 4)
            by = w.bytes_per_iter + a.shape[1] * 4 + extra_y
            P(f"{name:12s} th={th} wg={wg} fill={w.fill:.3f} "
              f"{per*1e6:7.1f} us  {by/per/1e9:6.1f} GB/s "
              f"({100*by/per/1e9/sbw:5.1f}% of STREAM)  err={err:.2e}")
        except Exception as e:
            P(f"{name:12s} FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
