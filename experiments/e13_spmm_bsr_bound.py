"""e13: what binds the BSR SpMM kernel? (round 4)

The r3b suite shows cant K=8/32 at 262/264 us (76/88% of STREAM) but consph
at 511/488 us (52/64%) — consph streams only 1.34x the block bytes yet takes
1.9x the time. K-independence of the runtime says the bound is NOT the MXU
dot count (K=8 and K=32 cost the same); candidates:

  a) block stream rate itself (per-matrix variance in DMA efficiency)
  b) per-block fixed overhead (dynamic slices, RMW) -> scales with nblocks
  c) bf16x3's 3 dots + 4 VPU casts per block -> precision=DEFAULT compare
  d) tb too small (grid overhead) or too big (pipeline stalls)

Variants, per matrix (cant, consph), K=8:
  base        PallasSpmmBsr(br=64, tb=16, bf16x3)   [production]
  default1    precision=DEFAULT (1 MXU pass)        [isolates (c)]
  tb8/tb32/tb64  tile-batch sweep                   [isolates (d)]
  br128       (128,128) blocks                      [fewer, bigger blocks]
  stream      same grid/blocks, kernel only sums the block tile into a
              carried (br,128) acc (no x slice, no dot, no RMW-by-brow)
              [isolates (a) vs (b)]
"""
import sys
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
from sblas.ops.kernels.spmm_bsr_pallas import PallasSpmmBsr
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

_EPS = 1e-6


def stream_only_call(p: PallasSpmmBsr):
    """Kernel that only reads the block stream (sums tiles into a carried
    (br,128) acc) — the DMA upper bound for this geometry."""
    br, tb = p.br, p.tb

    def kern(c_ref, blk_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = c_ref[:]

        acc = out_ref[:]
        for b in range(tb):
            acc = acc + blk_ref[b * br:(b + 1) * br, :].astype(jnp.float32)
        out_ref[:] = acc

    return pl.pallas_call(
        kern,
        grid=(p.num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((tb * br, 128), lambda t: (t, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((br, 128), jnp.float32),
    )


def main():
    import threading
    import time as _time

    print(f"# devices {jax.devices()}", flush=True)

    def _beat():
        i = 0
        while True:
            _time.sleep(60)
            i += 1
            print(f"# [beat {i}]", flush=True)

    threading.Thread(target=_beat, daemon=True).start()
    sbw = stream_bandwidth()
    print(f"# STREAM {sbw:.1f} GB/s on {jax.devices()[0]}", flush=True)
    k = 8
    for name in ("cant", "consph"):
        a = datasets.emulate(name, dtype=np.float32)
        n = a.shape[1]
        x = np.random.default_rng(0).standard_normal((n, k)).astype(
            np.float32)
        gold = spmm_golden(a, x)
        x0 = jnp.asarray(x)

        def run(tag, **kw):
            try:
                p = PallasSpmmBsr(a, **kw)
            except ValueError as e:
                print(f"{name:7s} {tag:9s} SKIP {str(e)[:80]}", flush=True)
                return
            arrs = p.device_arrays()
            err = rel_err(np.asarray(p.apply_pure(arrs, x0)), gold)

            def step(xc, arrs, x0):
                return x0 + _EPS * p.apply_pure(arrs, xc)

            t = measure_seconds_per_iter(step, x0, arrs, x0,
                                         iters_lo=5, iters_hi=25)
            gbps = p.bytes_per_iter / t / 1e9
            print(f"{name:7s} {tag:9s} {t*1e6:7.1f} us  {gbps:6.1f} GB/s "
                  f"({100*gbps/sbw:5.1f}% STREAM, "
                  f"blocks {p.bytes_per_iter>>20} MB)  rel_err {err:.1e}",
                  flush=True)

        run("base", br=64, tb=16)
        run("default1", br=64, tb=16, precision=jax.lax.Precision.DEFAULT)
        run("tb8", br=64, tb=8)
        run("tb32", br=64, tb=32)
        run("tb64", br=64, tb=64)
        run("br128", br=128, tb=8)

        # stream-only bound
        p = PallasSpmmBsr(a, br=64, tb=16)
        call = stream_only_call(p)

        def sstep(c, blocks):
            return call(c, blocks)

        c0 = jnp.zeros((p.br, 128), jnp.float32)
        t = measure_seconds_per_iter(sstep, c0, p._blocks,
                                     iters_lo=5, iters_hi=25)
        bytes_ = p._blocks.size * 4
        print(f"{name:7s} stream    {t*1e6:7.1f} us  {bytes_/t/1e9:6.1f} GB/s"
              f" ({100*bytes_/t/1e9/sbw:5.1f}% STREAM)", flush=True)


if __name__ == "__main__":
    main()
