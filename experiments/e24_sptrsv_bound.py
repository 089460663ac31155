"""e24: SpTRSV round-cost decomposition — how close is the wavefront solve
to its hardware floor? (VERDICT r1 weak #5: "no committed experiment ruling
out deeper round-window/level fusion".)

The solve is one pallas_call whose sequential grid is the wavefront; its
wall-clock = num_rounds x (per-round issue cost) + num_tiles x grid-step
overhead.  This experiment measures ABLATED variants of the k=1 round body
at IDENTICAL grid/tile/schedule structure on the two suite factors:

  real      the production body (gather chain + MXU dot + acc + solve write)
  nogather  g = window row broadcast (drops nwin take_along_axis + selects,
            keeps the x2d read->write dependency chain)
  nodot     real gathers, but the MXU segment-dot replaced by a slice
  chain     minimal dependent round: x2d row read -> acc write -> solve write
  floor     schedule streams + one acc write/round, NO x2d dependence

floor bounds what any round-count-preserving fusion could reach; (real -
chain) is the gather+dot budget; (chain - floor) is the price of the
sequential x2d dependency itself.  Results -> e24_results.jsonl + DESIGN.
"""
import json
import sys
import time
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
from sblas.ops.kernels.sptrsv_pallas import (
    PallasSptrsv, LANES, SUB, SUBLANES, _kernel as production_kernel)
from sblas.utils.timing import measure_seconds_per_iter

OUT = Path(__file__).resolve().parent / "e24_results.jsonl"


def variant_kernel(th, n_dense, nwin, mode):
    """k=1 round body with ablation switches (mirrors sptrsv_pallas._kernel;
    'real' here must match its measured production time)."""
    ns = th // SUBLANES

    def kern(wrow_ref, oblk_ref, final_ref, bfirst_ref,
             dense_ref, dblk_ref, b_ref,
             val_ref, col_ref, minv_ref, x2d_ref, acc_ref):
        t = pl.program_id(0)
        seg = (jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB), 0)
               // (LANES // SUB)
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB), 1)
               ).astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            x2d_ref[:] = jnp.zeros_like(x2d_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for i in range(ns):
            w = wrow_ref[t * ns + i]
            b = oblk_ref[t * ns + i]
            fin = final_ref[t * ns + i]
            bfirst = bfirst_ref[t * ns + i]
            v = val_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                jnp.float32)
            slab = b * SUBLANES
            if mode == "floor":
                # no x2d read at all: schedule stream + acc RMW only
                part = v[:, :SUB]
                acc_cur = acc_ref[pl.ds(slab, SUBLANES), :]
                acc_ref[pl.ds(slab, SUBLANES), :] = acc_cur + part
                continue
            if mode in ("real", "nodot"):
                c = col_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                    jnp.int32)
                cjs = [jnp.clip(c - j * 128, 0, 127) for j in range(nwin)]
                g = None
                for j in range(nwin):
                    xw = x2d_ref[pl.ds(w + j, 1), :]
                    tab = jnp.broadcast_to(xw, (SUBLANES, 128))
                    gj = jnp.take_along_axis(tab, cjs[j], axis=1)
                    g = gj if g is None else jnp.where(c >= j * 128, gj, g)
            else:  # nogather / chain: keep the x2d read dependency only
                xw = x2d_ref[pl.ds(w, 1), :]
                g = jnp.broadcast_to(xw, (SUBLANES, 128))
            if mode in ("real", "nogather"):
                part = jnp.dot(v * g, seg,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            else:  # nodot / chain
                part = (v * g)[:, :SUB]
            acc_cur = acc_ref[pl.ds(slab, SUBLANES), :]
            acc_new = jnp.where(bfirst == 1, part, acc_cur + part)
            acc_ref[pl.ds(slab, SUBLANES), :] = acc_new

            @pl.when(fin == 1)
            def _(acc_new=acc_new, slab=slab, b=b):
                bv = b_ref[pl.ds(slab, SUBLANES), :]
                solved = bv - acc_new
                for s in range(SUBLANES):
                    x2d_ref[pl.ds(b, 1), s * SUB:(s + 1) * SUB] = (
                        solved[s:s + 1, :])

    return kern


def run_case(tag, l):
    ex = PallasSptrsv(l, lower=True)
    lay = ex.layout
    arrs = ex.device_arrays()
    nrounds = len(lay.round_wrow)
    nb8 = (lay.num_blocks + 1) * SUBLANES
    rng = np.random.default_rng(0)
    b2d = jnp.asarray(rng.standard_normal((nb8, SUB)).astype(np.float32))
    idx = lambda t, wr, ob, fin, bf, dn, db: (t, 0)
    for mode in ("real", "nogather", "nodot", "chain", "floor"):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(lay.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((lay.th, LANES), idx),
                pl.BlockSpec((lay.th, LANES), idx),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )
        body = (production_kernel(lay.th, lay.n_dense, 1, lay.nwin)
                if mode == "real"
                else variant_kernel(lay.th, lay.n_dense, lay.nwin, mode))
        call = pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((lay.x2d_rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct((nb8, SUB), jnp.float32),
            ),
        )

        def step(b, arrs, b0, call=call):
            x2d, acc = call(arrs["wr"], arrs["ob"], arrs["fin"],
                            arrs["bfirst"], arrs["dense"], arrs["dblk"],
                            b, arrs["val"], arrs["lcol"], arrs["minvT"])
            return b0 + 1e-6 * (jnp.sum(x2d) + jnp.sum(acc))

        try:
            per = measure_seconds_per_iter(step, b2d, arrs, b2d,
                                           iters_lo=10, iters_hi=30)
        except Exception as e:
            print(f"# {tag} {mode} FAIL: {str(e)[:200]}", flush=True)
            continue
        rec = {"name": "e24_sptrsv_bound", "matrix": tag, "mode": mode,
               "seconds_per_iter": per,
               "ns_per_round": 1e9 * per / nrounds,
               "rounds": nrounds, "tiles": lay.num_tiles,
               "nlevels": lay.nlevels, "nwin": lay.nwin, "th": lay.th}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


def main():
    run_case("band-parallel", datasets.lower_triangular(
        62451, 30, bandwidth=4000, seed=1, dtype=np.float32))
    spd = datasets.poisson2d_nd(120, dtype=np.float64)
    run_case("chol-nd-poisson2d-120",
             datasets.cholesky_factor(spd, dtype=np.float32))


if __name__ == "__main__":
    main()
