"""Experiment 4: more Mosaic gather probes + throughput of the supported form.

- Retry take_along_axis axis=0 with full traceback (e2 printed empty error).
- axis=0 with small table (R=8,16,32).
- Throughput benchmark of axis=1 (8,128)-window gather inside a streaming kernel.
"""
import time, functools, traceback
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kern, out_shape, *inputs):
    try:
        fn = pl.pallas_call(kern, out_shape=out_shape,
                            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
                            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        r = jax.jit(fn)(*inputs)
        jax.block_until_ready(r)
        print(f"PROBE {name}: OK")
        return True
    except Exception as e:
        lines = [l for l in str(e).split("\n") if l.strip()][:3]
        print(f"PROBE {name}: FAIL | " + " | ".join(l[:100] for l in lines))
        return False


def main():
    rng = np.random.default_rng(0)
    for R in (8, 16, 32, 128, 512):
        table = jnp.arange(R * 128, dtype=jnp.float32).reshape(R, 128)
        idx = jnp.asarray(rng.integers(0, R, (8, 128), dtype=np.int32))
        probe(f"axis0 R={R}",
              lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
                  slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)),
              jax.ShapeDtypeStruct((8, 128), jnp.float32), table, idx)

    # dynamic_gather via jax.lax.gather directly? try pltpu primitives
    names = [n for n in dir(pltpu) if "gather" in n.lower()]
    print("pltpu gather-ish:", names)
    import jax.experimental.pallas as plmod
    print("pl gather-ish:", [n for n in dir(plmod) if "gather" in n.lower()])

    # int8/int16 index dtype for axis1 gather?
    t8 = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    for idt in (np.int8, np.uint8, np.int16, np.int32):
        idx1 = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(idt))
        probe(f"axis1 idx={np.dtype(idt).name}",
              lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
                  slice(None),
                  jnp.take_along_axis(t_ref[:], i_ref[:].astype(jnp.int32), axis=1)),
              jax.ShapeDtypeStruct((8, 128), jnp.float32), t8, idx1)

    # bigger sublane count for axis1: (256, 128) table+idx
    t256 = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx256 = jnp.asarray(rng.integers(0, 128, (256, 128), dtype=np.int32))
    probe("axis1 (256,128)",
          lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
              slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)),
          jax.ShapeDtypeStruct((256, 128), jnp.float32), t256, idx256)

    # --- throughput of axis=1 gather: big streaming kernel ---
    # in: idx (M,128) int32 + val (M,128) f32 streamed from HBM; x window fixed.
    M = 8192  # 1M gathers per call
    BLK = 512
    val = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (M, 128), dtype=np.int32))
    xw = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))

    def kern(x_ref, v_ref, i_ref, o_ref):
        table = jnp.broadcast_to(x_ref[0:1, :], (BLK, 128))
        g = jnp.take_along_axis(table, i_ref[:], axis=1)
        o_ref[:] = jnp.sum(v_ref[:] * g, axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(xw, val, idx, iters):
        f = pl.pallas_call(
            kern,
            grid=(M // BLK,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        )
        def body(k, acc):
            return acc + f(xw + acc, val, idx)[0, 0]
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        jax.block_until_ready(run(xw, val, idx, 1))
        for iters in (20,):
            jax.block_until_ready(run(xw, val, idx, iters))
            t0 = time.perf_counter(); jax.block_until_ready(run(xw, val, idx, iters)); t1 = time.perf_counter()
            jax.block_until_ready(run(xw, val, idx, 1))
            t2 = time.perf_counter()
            per = ((t1 - t0) - (t2 - t1)) / (iters - 1)
            elems = M * 128
            print(f"axis1-gather stream: {per*1e3:.3f} ms/iter, {elems/per/1e9:.1f} Gelem/s, {elems*8/per/1e9:.1f} GB/s streamed")
    except Exception as e:
        print("stream bench FAIL:", str(e)[:300])


if __name__ == "__main__":
    main()
