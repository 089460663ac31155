"""e28: PSEG graph-SpMV round-cost decomposition (e24's methodology).

uk-2002@0.05 / twitter7@0.02 run at 66-69% of STREAM (suite_r7) with fill
0.42-0.48 — padded slots are physically streamed, so two different levers
exist depending on what binds:
  DMA-bound  -> fill / index-width cuts pay ~proportionally,
  issue-bound-> only fewer vector ops per round pay (cf. bf16 SpMV).

Ablated hub+tail kernel variants at identical grid/tile/stream structure:
  real       production body (gather -> v*g -> 8 masked sublane reductions)
  nogather   g = panel-row broadcast (drops take_along_axis+select, keeps
             the x2d read)
  noscatter  real gathers, scatter replaced by outb = p (shape-preserving)
  floor      schedule streams + acc RMW only (no x2d read, no scatter):
             the pure DMA+grid bound
  packed16   the candidate DMA optimization: lcol+tsb fused into ONE int16
             plane (tsb<<8 | lcol — lcol<=255, tsb<=7 fit 11 bits), cutting
             the schedule stream 8 -> 6 B/slot; kernel unpacks with a
             shift+and. Pays iff the real body is DMA-bound.

Results -> e28_results.jsonl + DESIGN.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sblas import datasets
from sblas.golden import spmv_golden, rel_err
from sblas.ops.kernels.spmv_pseg import (
    PallasSpmvScattered, LANES, SUBLANES, _kernel as production_kernel)
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

OUT = Path(__file__).resolve().parent / "e28_results.jsonl"


def variant_kernel(th, tail, mode):
    ns = th // SUBLANES
    packed = mode == "packed16"

    def kern(*refs):
        if packed:
            wrow_ref, oblk_ref, x2d_ref, val_ref, pk_ref, out_ref = refs
        else:
            (wrow_ref, oblk_ref, x2d_ref, val_ref, col_ref, tsb_ref,
             out_ref) = refs
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for i in range(ns):
            w = wrow_ref[t * ns + i]
            b = oblk_ref[t * ns + i]
            v = val_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                jnp.float32)
            slab = b * SUBLANES
            if mode == "floor":
                outb = v
                cur = out_ref[pl.ds(slab, SUBLANES), :]
                out_ref[pl.ds(slab, SUBLANES), :] = cur + outb
                continue
            if packed:
                pk = pk_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                    jnp.int32)
                c = pk & 255
                tsb = pk >> 8
            else:
                c = col_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                    jnp.int32)
                tsb = tsb_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                    jnp.int32)
            if mode == "nogather":
                if tail:
                    g = x2d_ref[pl.ds(w, SUBLANES), :]
                else:
                    xw = x2d_ref[pl.ds(w, 1), :]
                    g = jnp.broadcast_to(xw, (SUBLANES, 128))
            else:  # real-gather path (real / noscatter)
                c0 = jnp.minimum(c, 127)
                c1 = jnp.maximum(c - 128, 0)
                if tail:
                    x8a = x2d_ref[pl.ds(w, SUBLANES), :]
                    x8b = x2d_ref[pl.ds(w + SUBLANES, SUBLANES), :]
                    g0 = jnp.take_along_axis(x8a, c0, axis=1)
                    g1 = jnp.take_along_axis(x8b, c1, axis=1)
                else:
                    xw = x2d_ref[pl.ds(w, 1), :]
                    table = jnp.broadcast_to(xw, (SUBLANES, 128))
                    xw1 = x2d_ref[pl.ds(w + 1, 1), :]
                    table1 = jnp.broadcast_to(xw1, (SUBLANES, 128))
                    g0 = jnp.take_along_axis(table, c0, axis=1)
                    g1 = jnp.take_along_axis(table1, c1, axis=1)
                g = jnp.where(c < 128, g0, g1)
            p = v * g
            if mode == "noscatter":
                outb = p
            else:  # real / nogather keep the true scatter
                parts = [
                    jnp.sum(p * (tsb == ts).astype(jnp.float32), axis=0,
                            keepdims=True)
                    for ts in range(SUBLANES)
                ]
                outb = jnp.concatenate(parts, axis=0)
            cur = out_ref[pl.ds(slab, SUBLANES), :]
            out_ref[pl.ds(slab, SUBLANES), :] = cur + outb

    return kern


def run_case(tag, a):
    ex = PallasSpmvScattered(a)
    w = ex.layout
    arrs = ex.device_arrays()
    stream = stream_bandwidth()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    y_ref = spmv_golden(a, x)
    xp = jnp.asarray(x[np.asarray(ex.colperm)])
    pad = w.x2d_rows * 128 - a.shape[1]
    nrounds = (ex._tiles_h + ex._tiles_t) * (w.th // SUBLANES)

    def pack16(lcol, tsb):
        return ((tsb.astype(jnp.int32) << 8)
                | lcol.astype(jnp.int32)).astype(jnp.int16)

    pk_h = jax.device_put(pack16(arrs["lcol"], arrs["tsb"]))
    pk_t = (jax.device_put(pack16(arrs["lcol_t"], arrs["tsb_t"]))
            if "lcol_t" in arrs else None)

    for mode in ("real", "nogather", "noscatter", "floor", "packed16"):
        packed = mode == "packed16"
        if mode == "real":
            call_h, call_t = ex._call, ex._call_t
        else:
            def build(num_tiles, tail):
                nsched = 2 if packed else 3
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(num_tiles,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [
                        pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0))
                        for _ in range(nsched)
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )
                from sblas.utils.backend import on_cpu
                return pl.pallas_call(
                    variant_kernel(w.th, tail, mode),
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((w.y_rows, LANES),
                                                   jnp.float32),
                    interpret=on_cpu(),
                )
            call_h = build(ex._tiles_h, False)
            call_t = build(ex._tiles_t, True) if ex._tiles_t else None

        def apply_perm(arrs, xperm, call_h=call_h, call_t=call_t,
                       packed=packed):
            x2d = jnp.pad(xperm, (0, pad)).reshape(-1, 128)
            if packed:
                y2d = call_h(arrs["wr"], arrs["ob"], x2d, arrs["val"], pk_h)
                if call_t is not None:
                    y2d = y2d + call_t(arrs["wr_t"], arrs["ob_t"], x2d,
                                       arrs["val_t"], pk_t)
                return y2d
            y2d = call_h(arrs["wr"], arrs["ob"], x2d, arrs["val"],
                         arrs["lcol"], arrs["tsb"])
            if call_t is not None:
                y2d = y2d + call_t(arrs["wr_t"], arrs["ob_t"], x2d,
                                   arrs["val_t"], arrs["lcol_t"],
                                   arrs["tsb_t"])
            return y2d

        rel = None
        if mode == "real":
            yp = np.asarray(jax.device_get(ex.apply_permuted(arrs, xp)))
            inv = np.asarray(jax.device_get(ex._rowperm_inv))
            rel = float(rel_err(yp[inv], y_ref))
            y2d_real = np.asarray(jax.device_get(apply_perm(arrs, xp)))
        elif mode == "packed16":
            # raw-kernel equivalence vs the real body (the executor's
            # readout epilogue — virtual-row merge etc. — is mode-agnostic)
            y2d_pk = np.asarray(jax.device_get(apply_perm(arrs, xp)))
            rel = float(rel_err(y2d_pk.ravel(), y2d_real.ravel()))

        def step(xc, arrs, x0):
            y2d = apply_perm(arrs, xc)
            return x0 + 1e-6 * jnp.ravel(y2d)[: xc.shape[0]]

        try:
            per = measure_seconds_per_iter(step, xp, arrs, xp,
                                           iters_lo=10, iters_hi=30)
        except Exception as e:
            print(f"# {tag} {mode} FAIL: {str(e)[:250]}", flush=True)
            continue
        bpi = ex.bytes_per_iter
        if packed:
            bpi -= 2 * int(nrounds) * SUBLANES * LANES  # one int16 plane
        gbps = bpi / per / 1e9
        rec = {"name": "e28_pseg_bound", "matrix": tag, "mode": mode,
               "seconds_per_iter": per, "ns_per_round": 1e9 * per / nrounds,
               "gbps_model": gbps, "pct_stream": 100 * gbps / stream,
               "fill": w.fill, "rounds": int(nrounds), "th": w.th,
               "rel_err": rel, "stream_gbps": stream}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


def main():
    run_case("uk-2002@0.05",
             datasets.emulate("uk-2002", scale=0.05, dtype=np.float32))
    run_case("twitter7@0.02",
             datasets.emulate("twitter7", scale=0.02, dtype=np.float32))


if __name__ == "__main__":
    main()
