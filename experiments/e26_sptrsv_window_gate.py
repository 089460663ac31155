"""e26: gate the SpTRSV gather chain on the per-round NEEDED window count.

e24 put the nwin=32 gather chain at 175 ns/round (issue rate).  Host
analysis of the layouts shows rounds rarely need all 32 windows:
band-parallel mean 22.9/32 (71% of ops), chol-nd-120 mean 13.1/32 (41%).
If skipped windows genuinely skip ISSUE (Mosaic scalar-core branches run
ahead of the vector core), gating projects ~15% / ~30% wall-clock.

Variants at identical layout/schedule (nwin=32, th=128, split3 dot):
  static   production unrolled body (baseline)
  fori     g = lax.fori_loop(1, need_r, window_body, g0) — dynamic trip
  chunk8   unrolled, but windows [8q, 8q+8) wrapped in lax.cond(8q < need)
  chunk4   same with 4-window chunks

Each variant is validated against scipy spsolve_triangular end-to-end
before timing.  Results -> e26_results.jsonl + DESIGN.
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
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy.sparse.linalg import spsolve_triangular

from sblas import datasets
from sblas.ops.kernels.sptrsv_pallas import (
    PallasSptrsv, LANES, SUB, SUBLANES, LPS, _segment_dot)
from sblas.utils.timing import measure_seconds_per_iter

OUT = Path(__file__).resolve().parent / "e26_results.jsonl"


def gated_kernel(th, n_dense, nwin, variant):
    """k=1 wavefront body with window gating (mirrors production _kernel)."""
    ns = th // SUBLANES

    def kern(need_ref, wrow_ref, oblk_ref, final_ref, bfirst_ref,
             dense_ref, dblk_ref, b_ref,
             val_ref, col_ref, minv_ref, x2d_ref, acc_ref):
        t = pl.program_id(0)
        seg = (jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB), 0) // LPS
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB), 1)
               ).astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            x2d_ref[:] = jnp.zeros_like(x2d_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for i in range(ns):
            r = t * ns + i
            w = wrow_ref[r]
            b = oblk_ref[r]
            fin = final_ref[r]
            bfirst = bfirst_ref[r]
            need = need_ref[r]
            v = val_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                jnp.float32)
            c = col_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.int32)
            slab = b * SUBLANES

            def window(j, g):
                # j may be dynamic (fori) or static (chunk variants)
                cj = jnp.clip(c - j * 128, 0, 127)
                xw = x2d_ref[pl.ds(w + j, 1), :]
                tab = jnp.broadcast_to(xw, (SUBLANES, 128))
                gj = jnp.take_along_axis(tab, cj, axis=1)
                if isinstance(j, int) and j == 0:
                    return gj
                return jnp.where(c >= j * 128, gj, g)

            if variant == "static":
                g = window(0, None)
                for j in range(1, nwin):
                    g = window(j, g)
            elif variant == "fori":
                g = jax.lax.fori_loop(1, need, window, window(0, None))
            else:
                chunk = int(variant[5:])
                g = window(0, None)
                for j in range(1, chunk):
                    g = window(j, g)
                for q in range(1, nwin // chunk):
                    def run(g, q=q):
                        for j in range(q * chunk, (q + 1) * chunk):
                            g = window(j, g)
                        return g
                    g = jax.lax.cond(q * chunk < need, run, lambda g: g, g)

            part = _segment_dot(v * g, seg, "split3")
            acc_cur = acc_ref[pl.ds(slab, SUBLANES), :]
            acc_new = jnp.where(bfirst == 1, part, acc_cur + part)
            acc_ref[pl.ds(slab, SUBLANES), :] = acc_new

            if n_dense:
                dn = dense_ref[r]
                db = dblk_ref[r]

                @pl.when((fin == 1) & (dn == 0))
                def _(acc_new=acc_new, slab=slab, b=b):
                    bv = b_ref[pl.ds(slab, SUBLANES), :]
                    solved = bv - acc_new
                    for s in range(SUBLANES):
                        x2d_ref[pl.ds(b, 1), s * SUB:(s + 1) * SUB] = (
                            solved[s:s + 1, :])

                @pl.when((fin == 1) & (dn == 1))
                def _(acc_new=acc_new, slab=slab, b=b, db=db):
                    bv = b_ref[pl.ds(slab, SUBLANES), :]
                    rhs = bv - acc_new
                    for s in range(SUBLANES):
                        x2d_ref[pl.ds(b, 1), s * SUB:(s + 1) * SUB] = (
                            rhs[s:s + 1, :])
                    xb = x2d_ref[pl.ds(b, 1), :]
                    mv = minv_ref[pl.ds(db * LANES, LANES), :]
                    sv = jnp.dot(xb, mv,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                    x2d_ref[pl.ds(b, 1), :] = sv
            else:
                @pl.when(fin == 1)
                def _(acc_new=acc_new, slab=slab, b=b):
                    bv = b_ref[pl.ds(slab, SUBLANES), :]
                    solved = bv - acc_new
                    for s in range(SUBLANES):
                        x2d_ref[pl.ds(b, 1), s * SUB:(s + 1) * SUB] = (
                            solved[s:s + 1, :])

    return kern


def round_need(lay):
    R = len(lay.round_wrow)
    val = np.asarray(lay.val)
    col = np.asarray(lay.lcol).astype(np.int64)
    need = np.ones(R, dtype=np.int32)
    for r in range(R):
        v = val[r * 8:(r + 1) * 8]
        cc = col[r * 8:(r + 1) * 8]
        m = v != 0
        if m.any():
            need[r] = cc[m].max() // 128 + 1
    return need


def run_case(tag, l):
    ex = PallasSptrsv(l, lower=True)
    lay = ex.layout
    arrs = ex.device_arrays()
    need = jnp.asarray(round_need(lay))
    nrounds = len(lay.round_wrow)
    rng = np.random.default_rng(0)
    bh = rng.standard_normal(l.shape[0]).astype(np.float64)
    a_sp = sp.csr_matrix((l.data.astype(np.float64), l.indices, l.indptr),
                         shape=l.shape)
    x_ref = spsolve_triangular(a_sp, bh, lower=True)
    b2d = jnp.asarray(ex.b_to_b2d(bh))

    idx = lambda t, nd, wr, ob, fin, bf, dn, db: (t, 0)
    for variant in ("static", "fori", "chunk8", "chunk4"):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
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
        call = pl.pallas_call(
            gated_kernel(lay.th, lay.n_dense, lay.nwin, variant),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((lay.x2d_rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct(((lay.num_blocks + 1) * SUBLANES, SUB),
                                     jnp.float32),
            ),
        )

        def solve(b, arrs, call=call):
            x2d, _ = call(need, arrs["wr"], arrs["ob"], arrs["fin"],
                          arrs["bfirst"], arrs["dense"], arrs["dblk"],
                          b, arrs["val"], arrs["lcol"], arrs["minvT"])
            return x2d

        try:
            x2d = jax.jit(solve)(b2d, arrs)
            x = ex.x2d_to_x(np.asarray(jax.device_get(x2d)))
            rel = float(np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref))
        except Exception as e:
            print(f"# {tag} {variant} COMPILE/RUN FAIL: {str(e)[:300]}",
                  flush=True)
            continue

        def step(b, arrs, b0):
            x2d = solve(b, arrs)
            return b0 + 1e-6 * jnp.sum(x2d)

        try:
            per = measure_seconds_per_iter(step, b2d, arrs, b2d,
                                           iters_lo=10, iters_hi=30)
        except Exception as e:
            print(f"# {tag} {variant} TIME FAIL: {str(e)[:200]}", flush=True)
            continue
        rec = {"name": "e26_sptrsv_window_gate", "matrix": tag,
               "variant": variant, "seconds_per_iter": per,
               "ns_per_round": 1e9 * per / nrounds, "rel_err": rel,
               "rounds": nrounds, "mean_need": float(np.mean(round_need(lay))),
               "nwin": lay.nwin, "th": lay.th}
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
