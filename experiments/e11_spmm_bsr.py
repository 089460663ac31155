"""Prototype: dense-block (BSR) Pallas SpMM — MXU matmuls, zero gathers.

Round-3 finding: the w-SELL SpMM kernel does K x (2 gathers + where + dot)
per window group -> 57 GB/s (8.6% of STREAM) at K=8 and a Mosaic compiler
crash at K=32 (ngrp*K unrolled bodies). For FEM matrices the nonzeros
cluster: 64x128 dense blocks hold them at ~0.11-0.14 density (~128 MB for
cant), so streaming dense blocks into (64,128)@(128,K) MXU dots needs no
gather at all and the same kernel shape works for any K.

Variants: precision DEFAULT/HIGH/HIGHEST, br 32/64, tile-blocks per grid
step, K = 8/32.
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
from sblas.golden import spmm_golden, rel_err
from sblas.retile_bsr import pack_bsr
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

P = lambda *a: print(*a, flush=True)


def make_kernel(br, tb, k, precision):
    bf16x3 = precision == "bf16x3"

    def kern(brow_ref, bcol_ref, x_ref, blk_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for b in range(tb):
            i = t * tb + b
            bc = bcol_ref[i]
            br_ = brow_ref[i]
            a = blk_ref[b * br:(b + 1) * br, :]
            xa = x_ref[pl.ds(bc * 128, 128), :]
            if bf16x3:
                # manual 3-pass: a_hi@x_hi + a_hi@x_lo + a_lo@x_hi
                ah = a.astype(jnp.bfloat16)
                al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
                xh = xa.astype(jnp.bfloat16)
                xl = (xa - xh.astype(jnp.float32)).astype(jnp.bfloat16)
                de = jax.lax.Precision.DEFAULT
                p = (jnp.dot(ah, xh, preferred_element_type=jnp.float32,
                             precision=de)
                     + jnp.dot(ah, xl, preferred_element_type=jnp.float32,
                               precision=de)
                     + jnp.dot(al, xh, preferred_element_type=jnp.float32,
                               precision=de))
            else:
                p = jnp.dot(a, xa, preferred_element_type=jnp.float32,
                            precision=precision)
            slab = br_ * br
            cur = out_ref[pl.ds(slab, br), :]
            out_ref[pl.ds(slab, br), :] = cur + p

    return kern


def main():
    a = datasets.emulate("cant", dtype=np.float32)
    rng = np.random.default_rng(0)
    sbw = stream_bandwidth()
    P(f"# STREAM {sbw:.1f} GB/s  nnz={a.nnz}")

    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT

    for k in (8, 32):
        x = rng.standard_normal((a.shape[1], k)).astype(np.float32)
        gold = spmm_golden(a, x)
        for br, tb, prec, pname in [
            (64, 8, HI, "HIGHEST"),
            (64, 8, "bf16x3", "bf16x3"),
            (64, 8, DE, "DEFAULT"),
            (32, 16, HI, "HIGHEST"),
            (128, 4, HI, "HIGHEST"),
            (64, 16, HI, "HIGHEST"),
        ]:
            try:
                bsr = pack_bsr(a, br=br, bc=128)
                nb = bsr.nblocks
                T = -(-nb // tb)
                total = T * tb
                blocks = np.zeros((total * br, 128), np.float32)
                blocks[: nb * br] = bsr.blocks.reshape(nb * br, 128)
                brow = np.zeros(total, np.int32)
                bcol = np.zeros(total, np.int32)
                brow[:nb] = bsr.brow
                bcol[:nb] = bsr.bcol
                # pad slots: point at block-row holding zeros? use last row
                brow[nb:] = bsr.num_brows - 1
                mp = bsr.num_brows * br
                np_ = bsr.num_bcols * 128
                xpad = np.zeros((np_, k), np.float32)
                xpad[: a.shape[1]] = x

                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(T,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),  # x
                        pl.BlockSpec((tb * br, 128), lambda t, br_, bc_: (t, 0)),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )
                call = pl.pallas_call(
                    make_kernel(br, tb, k, prec), grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((mp, k), jnp.float32),
                )
                jb = jnp.asarray(blocks)
                jbr = jnp.asarray(brow)
                jbc = jnp.asarray(bcol)

                def step(xp, jbr, jbc, jb):
                    return call(jbr, jbc, xp, jb)

                y = np.asarray(jax.jit(step)(xpad, jbr, jbc, jb))[: a.shape[0]]
                err = rel_err(y, gold)
                per = measure_seconds_per_iter(
                    lambda xp, jbr, jbc, jb:
                        xp + step(xp, jbr, jbc, jb)[0, 0] * 1e-30,
                    jnp.asarray(xpad), jbr, jbc, jb,
                    iters_lo=8, iters_hi=32, repeats=2)
                by = blocks.size * 4 + nb * 8 + (np_ + mp) * k * 4
                gf = 2.0 * a.nnz * k / per / 1e9
                P(f"k={k:2d} br={br:3d} tb={tb:2d} {pname:7s} "
                  f"nb={nb:5d} {per*1e6:7.1f} us  {by/per/1e9:6.1f} GB/s "
                  f"({100*by/per/1e9/sbw:5.1f}%)  {gf:7.1f} GF/s  err={err:.2e}")
            except Exception as e:
                P(f"k={k} br={br} tb={tb} {pname}: FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
