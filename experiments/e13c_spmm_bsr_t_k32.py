"""e13c: transposed BSR SpMM follow-ups.

e13b: br=128 transposed hits the DMA roofline at K=8 (cant 206 us/778 GB/s,
consph 270 us/794 GB/s — vs 270/468 us production) but K=32 crashes the
remote Mosaic compiler outright, and lane-64 At tiles (br=64) always crash.

Here: (1) K=32 with the k axis processed as FOUR (8,128) sublane slices —
every tensor op keeps the k=8 shapes that are proven to compile; (2) K=32
direct again with tb=8 (smaller unroll) to bracket the crash; (3) K=8
br=128 on the rest of the FEM suite (pdb1HYS, pwtk) for density/bytes; and
(4) K=16 direct (is the cliff at k>8 or k>16?).
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
BR = 128


def build(a, tb, k, subk):
    """Transposed kernel; k processed in sublane slices of subk."""
    assert k % subk == 0
    bsr = pack_bsr(a, br=BR, bc=128)
    nb = bsr.nblocks
    T = -(-nb // tb)
    total = T * tb
    at = np.zeros((total * 128, BR), np.float32)
    at[: nb * 128] = bsr.blocks.transpose(0, 2, 1).reshape(nb * 128, BR)
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
            ab = at_ref[b * 128:(b + 1) * 128, :].astype(jnp.float32)
            ah = ab.astype(jnp.bfloat16)
            al = (ab - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            for s in range(k // subk):
                xa = xt_ref[s * subk:(s + 1) * subk, pl.ds(bc * 128, 128)]
                xh = xa.astype(jnp.bfloat16)
                xl = (xa - xh.astype(jnp.float32)).astype(jnp.bfloat16)
                p = (jnp.dot(xh, ah, preferred_element_type=jnp.float32,
                             precision=de)
                     + jnp.dot(xh, al, preferred_element_type=jnp.float32,
                               precision=de)
                     + jnp.dot(xl, ah, preferred_element_type=jnp.float32,
                               precision=de))
                cur = out_ref[s * subk:(s + 1) * subk, pl.ds(brw * BR, BR)]
                out_ref[s * subk:(s + 1) * subk, pl.ds(brw * BR, BR)] = (
                    cur + p)

    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((tb * 128, BR), lambda t, br_, bc_: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((k, bsr.num_brows * BR), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * total * BR * 128 * k),
            bytes_accessed=int(bytes_per_iter),
            transcendentals=0,
        ),
    )
    arrs = {"brow": jnp.asarray(brow), "bcol": jnp.asarray(bcol),
            "at": jnp.asarray(at)}
    npanels = bsr.num_bcols

    def apply_pure(arrs, x):
        pad = npanels * 128 - a.shape[1]
        xt = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0))).T
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

    cases = [
        ("cant", 32, 8, 16), ("cant", 32, 32, 16),   # k32 as 4x8 slices
        ("cant", 32, 32, 8),                          # k32 direct, tb=8
        ("cant", 16, 16, 16),                         # k16 direct
        ("consph", 32, 8, 16),
        ("pdb1HYS", 8, 8, 16), ("pdb1HYS", 32, 8, 16),
        ("pwtk", 8, 8, 16), ("pwtk", 32, 8, 16),
    ]
    for name, k, subk, tb in cases:
        a = datasets.emulate(name, dtype=np.float32)
        x = np.random.default_rng(0).standard_normal(
            (a.shape[1], k)).astype(np.float32)
        gold = spmm_golden(a, x)
        x0 = jnp.asarray(x)
        try:
            fn, arrs, bpi = build(a, tb, k, subk)

            def step(xc, arrs, x0):
                return x0 + _EPS * fn(arrs, xc)

            err = rel_err(np.asarray(fn(arrs, x0)), gold)
            t = measure_seconds_per_iter(step, x0, arrs, x0,
                                         iters_lo=5, iters_hi=25)
            gbps = bpi / t / 1e9
            gf = 2 * a.nnz * k / t / 1e9
            print(f"{name:8s} k{k:2d}/s{subk:2d} tb{tb:2d} {t*1e6:7.1f} us"
                  f"  {gbps:6.1f} GB/s ({100*gbps/sbw:5.1f}%) {gf:6.0f} GF"
                  f"  {bpi>>20} MB  rel_err {err:.1e}", flush=True)
        except Exception as e:
            print(f"{name:8s} k{k:2d}/s{subk:2d} tb{tb:2d} FAIL "
                  f"{type(e).__name__}: {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
