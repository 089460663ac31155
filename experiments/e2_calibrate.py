"""Experiment 2: calibrate timing (STREAM copy) + enumerate Mosaic gather support."""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

def bench(f, *args, iters=50):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

def main():
    # --- STREAM triad: read 2 arrays write 1 ---
    N = 64 * 1024 * 1024  # 256 MB per array fp32
    a = jnp.ones((N,), jnp.float32)
    b = jnp.ones((N,), jnp.float32)

    @jax.jit
    def triad(a, b):
        return a + 2.0 * b

    t = bench(triad, a, b, iters=20)
    print(f"STREAM triad: {t*1e3:.3f} ms  -> {3*N*4/t/1e9:.1f} GB/s")

    @jax.jit
    def reduce_only(a):
        return jnp.sum(a)

    t = bench(reduce_only, a, iters=20)
    print(f"reduce:       {t*1e3:.3f} ms  -> {N*4/t/1e9:.1f} GB/s")

    # --- XLA gather bandwidth: y = x[idx] for random idx ---
    M = 16 * 1024 * 1024
    n_table = 62451
    x = jnp.ones((n_table,), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, n_table, M, dtype=np.int32))

    @jax.jit
    def gath(x, idx):
        return jnp.sum(x[idx])   # read idx 4B/el; x stays on chip

    t = bench(gath, x, idx, iters=20)
    print(f"XLA gather+reduce: {t*1e3:.3f} ms -> {M*4/t/1e9:.1f} GB/s (idx bytes), {M/t/1e9:.2f} Gelem/s")

    # --- Mosaic gather support probes ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = 512, 128  # table rows, lanes

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
            msg = str(e).split("\n")[0][:160]
            print(f"PROBE {name}: FAIL {msg}")
            return False

    table = jnp.arange(R * L, dtype=jnp.float32).reshape(R, L)
    idx_col = jnp.asarray(np.random.default_rng(1).integers(0, R, (64, L), dtype=np.int32))
    idx_row1d = jnp.asarray(np.random.default_rng(2).integers(0, R, (64,), dtype=np.int32))
    idx_lane = jnp.asarray(np.random.default_rng(3).integers(0, L, (64, L), dtype=np.int32))

    # P1: take_along_axis axis=0  out[i,l] = table[idx[i,l], l]
    probe("take_along_axis axis0 (per-lane sublane gather)",
          lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
              slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)),
          jax.ShapeDtypeStruct((64, L), jnp.float32), table, idx_col)

    # P2: take_along_axis axis=1  out[i,j] = table64[i, idx[i,j]]
    table64 = jnp.arange(64 * L, dtype=jnp.float32).reshape(64, L)
    probe("take_along_axis axis1 (per-sublane lane gather, 128 win)",
          lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
              slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)),
          jax.ShapeDtypeStruct((64, L), jnp.float32), table64, idx_lane)

    # P2b: axis=1 with wider table (512 window)
    tableW = jnp.arange(64 * 512, dtype=jnp.float32).reshape(64, 512)
    idx_laneW = jnp.asarray(np.random.default_rng(4).integers(0, 512, (64, 512), dtype=np.int32))
    probe("take_along_axis axis1 width-512",
          lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
              slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)),
          jax.ShapeDtypeStruct((64, 512), jnp.float32), tableW, idx_laneW)

    # P3: row gather via jnp.take axis=0 with 1D idx -> out[i,:] = table[idx[i],:]
    probe("jnp.take axis0 1D idx (row gather)",
          lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
              slice(None), jnp.take(t_ref[:], i_ref[:], axis=0)),
          jax.ShapeDtypeStruct((64, L), jnp.float32), table, idx_row1d)

    # P4: flat 1D gather  out[i] = flat[idx[i]]
    flat = jnp.arange(R * L, dtype=jnp.float32)
    idx_flat = jnp.asarray(np.random.default_rng(5).integers(0, R * L, (1024,), dtype=np.int32))
    probe("1D flat gather",
          lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
              slice(None), jnp.take(t_ref[:], i_ref[:], axis=0)),
          jax.ShapeDtypeStruct((1024,), jnp.float32), flat, idx_flat)

    # P5: 2D flat-ish: table (R,L), idx 2D (64,L) jnp.take axis=0 (gather rows w/ 2D idx)
    probe("jnp.take axis0 2D idx",
          lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
              slice(None), jnp.take(t_ref[:], i_ref[:], axis=0)[..., 0]),
          jax.ShapeDtypeStruct((64, L), jnp.float32), table, idx_col)

if __name__ == "__main__":
    main()
