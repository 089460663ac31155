"""e13b: transposed-operand BSR SpMM — K on sublanes, columns on lanes.

e13 showed the block DMA alone runs at 793-796 GB/s (115% of triad), so the
BSR kernel's gap to STREAM is per-block VPU/RMW overhead. In the production
layout X is (cols, K) and Y is (rows, K): at K=8 every slice/RMW touches
8-lane vregs at 1/16 lane utilization — xa is 16 vregs, the Y RMW 8 vregs
each way. Transposing both operands (Xt (K, cols), Yt (K, rows)) makes
  xa   = xt[:, bc*128 : +128]            (8,128)  = 1 vreg
  p    = dot(xa, At_block)               (8,64)
  rmw  = yt[:, brw*64 : +64] += p        (8,64)   = 1 vreg
with A stored TRANSPOSED (128, br) at pack time. Variants:
  t64   br=64  At tiles (128,64)   [lane-64 tiles, denser blocks]
  t128  br=128 At tiles (128,128)  [full-lane tiles, ~25% more DMA bytes]
each at tb in {16, 64}, K=8 and K=32, vs the production kernel's best.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sblas import datasets
from sblas.golden import spmm_golden, rel_err
from sblas.retile_bsr import pack_bsr
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

_EPS = 1e-6


def build_transposed(a, br, tb, k):
    """Pack + build the transposed-operand kernel; returns (fn, arrs, x->xt
    prep, yt->y post, bytes_per_iter)."""
    bsr = pack_bsr(a, br=br, bc=128)
    nb = bsr.nblocks
    T = -(-nb // tb)
    total = T * tb
    # At: (total*128, br) — block b transposed at rows [b*128:(b+1)*128]
    at = np.zeros((total * 128, br), np.float32)
    at[: nb * 128] = bsr.blocks.transpose(0, 2, 1).reshape(nb * 128, br)
    brow = np.zeros(total, np.int32)
    bcol = np.zeros(total, np.int32)
    brow[:nb] = bsr.brow
    bcol[:nb] = bsr.bcol
    brow[nb:] = bsr.num_brows - 1
    bytes_per_iter = at.size * 4 + total * 8

    def kern(brow_ref, bcol_ref, xt_ref, at_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        de = jax.lax.Precision.DEFAULT
        for b in range(tb):
            i = t * tb + b
            bc = bcol_ref[i]
            brw = brow_ref[i]
            xa = xt_ref[:, pl.ds(bc * 128, 128)]          # (k, 128)
            ab = at_ref[b * 128:(b + 1) * 128, :].astype(jnp.float32)
            xh = xa.astype(jnp.bfloat16)
            xl = (xa - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            ah = ab.astype(jnp.bfloat16)
            al = (ab - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            p = (jnp.dot(xh, ah, preferred_element_type=jnp.float32,
                         precision=de)
                 + jnp.dot(xh, al, preferred_element_type=jnp.float32,
                           precision=de)
                 + jnp.dot(xl, ah, preferred_element_type=jnp.float32,
                           precision=de))
            cur = out_ref[:, pl.ds(brw * br, br)]
            out_ref[:, pl.ds(brw * br, br)] = cur + p

    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Xt whole
                pl.BlockSpec((tb * 128, br), lambda t, br_, bc_: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((k, bsr.num_brows * br), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * total * br * 128 * k),
            bytes_accessed=int(bytes_per_iter),
            transcendentals=0,
        ),
    )
    arrs = {"brow": jnp.asarray(brow), "bcol": jnp.asarray(bcol),
            "at": jnp.asarray(at)}
    npanels = bsr.num_bcols

    def apply_pure(arrs, x):
        pad = npanels * 128 - a.shape[1]
        xt = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0))).T  # (k, cols)
        yt = call(arrs["brow"], arrs["bcol"], xt, arrs["at"])
        return yt.T[: a.shape[0]]

    return apply_pure, arrs, bytes_per_iter


def main():
    import threading

    print(f"# devices {jax.devices()}", flush=True)

    def _beat():
        i = 0
        while True:
            time.sleep(60)
            i += 1
            print(f"# [beat {i}]", flush=True)

    threading.Thread(target=_beat, daemon=True).start()
    sbw = stream_bandwidth()
    print(f"# STREAM {sbw:.1f} GB/s", flush=True)
    for name in ("cant", "consph"):
        a = datasets.emulate(name, dtype=np.float32)
        n = a.shape[1]
        for k in (8, 32):
            x = np.random.default_rng(0).standard_normal((n, k)).astype(
                np.float32)
            gold = spmm_golden(a, x)
            x0 = jnp.asarray(x)
            for br, tb in ((64, 16), (64, 64), (128, 16), (128, 64)):
                try:
                    fn, arrs, bpi = build_transposed(a, br, tb, k)

                    def step(xc, arrs, x0):
                        return x0 + _EPS * fn(arrs, xc)

                    err = rel_err(np.asarray(fn(arrs, x0)), gold)
                    t = measure_seconds_per_iter(step, x0, arrs, x0,
                                                 iters_lo=5, iters_hi=25)
                    gbps = bpi / t / 1e9
                    print(f"{name:7s} k{k:2d} t{br}/tb{tb:2d} {t*1e6:7.1f} us"
                          f"  {gbps:6.1f} GB/s ({100*gbps/sbw:5.1f}% STREAM,"
                          f" {bpi>>20} MB)  rel_err {err:.1e}", flush=True)
                except Exception as e:
                    print(f"{name:7s} k{k:2d} t{br}/tb{tb:2d} FAIL "
                          f"{type(e).__name__}: {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
