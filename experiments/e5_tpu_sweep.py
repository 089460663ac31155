"""Experiment 5: honest marginal-cost measurement of all XLA SpMV paths on
the real chip, plus Mosaic gather micro-probes. One process, compile-cached.

Usage: python -u experiments/e5_tpu_sweep.py > /tmp/e5.log 2>&1
"""
import sys, time, functools

import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
from sblas import datasets
from sblas.ops.spmv import SpmvPlan
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

P = lambda *a: print(*a, flush=True)


def main():
    P("dev:", jax.devices())
    sbw = stream_bandwidth()
    P(f"STREAM triad: {sbw:.1f} GB/s")

    for name in ("cant", "pwtk"):
        a = datasets.emulate(name, dtype=np.float32)
        m, n = a.shape
        P(f"--- {name}: {m}x{n} nnz={a.nnz} avg={a.nnz/m:.1f} "
          f"max={int(a.row_lengths.max())}")
        x0 = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
        for method in ("coo", "ell", "bucket", "pallas"):
            try:
                plan = SpmvPlan(a, method)
                def step(x, arrs, x0, p=plan):
                    return x0 + 1e-30 * p.apply_pure(arrs, x)
                per = measure_seconds_per_iter(step, x0, plan.device_arrays(),
                                               x0, iters_lo=5, iters_hi=25)
                by = plan.bytes_per_iter + 2 * n * 4
                P(f"{method:7s} {per*1e3:8.3f} ms  {by/per/1e9:7.1f} GB/s "
                  f"({100*by/per/1e9/sbw:5.1f}% stream)  "
                  f"{2*a.nnz/per/1e9:6.1f} GFLOP/s  fill={getattr(plan,'fill',1):.2f}")
            except Exception as e:
                P(f"{method}: FAIL {str(e)[:200]}")

    # --- Mosaic gather probes (from e4) ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe(name, kern, out_shape, *inputs):
        try:
            fn = pl.pallas_call(kern, out_shape=out_shape,
                                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
                                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
            jax.block_until_ready(jax.jit(fn)(*inputs))
            P(f"PROBE {name}: OK")
            return True
        except Exception as e:
            lines = [l for l in str(e).split("\n") if l.strip()][:2]
            P(f"PROBE {name}: FAIL | " + " | ".join(l[:120] for l in lines))
            return False

    rng = np.random.default_rng(0)
    for R in (8, 16, 32):
        table = jnp.arange(R * 128, dtype=jnp.float32).reshape(R, 128)
        idx = jnp.asarray(rng.integers(0, R, (8, 128), dtype=np.int32))
        probe(f"axis0 R={R}",
              lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
                  slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)),
              jax.ShapeDtypeStruct((8, 128), jnp.float32), table, idx)

    # dynamic row slice of 2D VMEM ref + broadcast + axis1 gather (w-SELL core op)
    x2d = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    lc = jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32))
    wr = jnp.asarray([[7]], dtype=jnp.int32)

    def wsell_core(w_ref, x_ref, c_ref, o_ref):
        w = w_ref[0, 0]
        xw = x_ref[pl.ds(w, 1), :]
        table = jnp.broadcast_to(xw, (8, 128))
        o_ref[:] = jnp.take_along_axis(table, c_ref[:], axis=1)

    try:
        fn = pl.pallas_call(
            wsell_core,
            in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
        r = jax.jit(fn)(wr, x2d, lc)
        ok = np.allclose(np.asarray(r), np.asarray(x2d)[7][np.asarray(lc)])
        P(f"PROBE wsell_core: OK correct={ok}")
    except Exception as e:
        P(f"PROBE wsell_core: FAIL {str(e)[:300]}")

    # throughput of the axis1 gather inside a streaming kernel
    M, BLK = 65536, 1024
    val = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (M, 128), dtype=np.int32))
    xw8 = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))

    def kern(x_ref, v_ref, i_ref, o_ref):
        table = jnp.broadcast_to(x_ref[0:1, :], (BLK, 128))
        g = jnp.take_along_axis(table, i_ref[:], axis=1)
        o_ref[:] = jnp.sum(v_ref[:] * g, axis=1, keepdims=True)

    def gather_stream(xw, val, idx):
        return pl.pallas_call(
            kern,
            grid=(M // BLK,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        )(xw, val, idx)

    try:
        def step(carry, val, idx):
            r = gather_stream(xw8 + carry * 1e-30, val, idx)
            return jnp.sum(r)

        per = measure_seconds_per_iter(step, jnp.float32(0.0), val, idx, iters_lo=5, iters_hi=25)
        elems = M * 128
        P(f"pallas axis1-gather stream: {per*1e3:.3f} ms, "
          f"{elems/per/1e9:.1f} Gelem/s, {elems*8/per/1e9:.1f} GB/s streamed "
          f"({100*elems*8/per/1e9/sbw:.1f}% stream)")
    except Exception as e:
        P(f"gather stream FAIL: {str(e)[:300]}")

    # same without the gather (pure streaming multiply-reduce) for comparison
    def kern2(v_ref, i_ref, o_ref):
        o_ref[:] = jnp.sum(v_ref[:] * i_ref[:].astype(jnp.float32), axis=1,
                           keepdims=True)

    def nostream(val, idx):
        return pl.pallas_call(
            kern2,
            grid=(M // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        )(val, idx)

    try:
        def step2(carry, val, idx):
            r = nostream(val, idx + carry.astype(jnp.int32))
            return jnp.sum(r)

        per = measure_seconds_per_iter(step2, jnp.float32(0.0), val, idx, iters_lo=5, iters_hi=25)
        elems = M * 128
        P(f"pallas no-gather stream:   {per*1e3:.3f} ms, "
          f"{elems*8/per/1e9:.1f} GB/s streamed ({100*elems*8/per/1e9/sbw:.1f}% stream)")
    except Exception as e:
        P(f"nostream FAIL: {str(e)[:300]}")


if __name__ == "__main__":
    main()
