"""e14: what binds the PSEG scattered-SpMV kernel? (round 4)

uk-2002@0.05 runs at 19.4% of STREAM (65 ns per 1024-slot round ~ 60 VPU
ops at issue rate), twitter7@0.02 at 14.3%. Per round the kernel does a
2-panel gather (~12 ops) and an 8-way masked sublane-reduction scatter
(~40 ops). Ablations (results intentionally wrong where marked):

  base        production kernel
  noscatter   out += p directly (WRONG results — isolates scatter cost)
  nogather    g = broadcast(xw) (WRONG — isolates gather cost)
  scatter3    3-stage butterfly scatter: route p to its target sublane by
              bit-fixing rolls (entries pre-sorted by ts per lane make the
              monotone routing collision-free-or-mergeable) — correct, and
              ~18 ops instead of ~40
  th sweep    grid-step size

The scatter3 variant needs the packer to sort each lane's entries by ts —
pack_pseg already emits lane queues in (panel) order; per-slot sort by ts
is applied here at experiment level by re-sorting the (8,) slot columns.
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
from sblas.ops.kernels.spmv_pseg import PallasSpmvScattered
from sblas.retile_pseg import SUBLANES, LANES
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

_EPS = 1e-6


def make_kernel(th, variant):
    ns = th // SUBLANES

    def kern(wrow_ref, oblk_ref, x2d_ref, val_ref, col_ref, tsb_ref,
             out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for i in range(ns):
            w = wrow_ref[t * ns + i]
            b = oblk_ref[t * ns + i]
            v = val_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                jnp.float32)
            c = col_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.int32)
            tsb = tsb_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                jnp.int32)
            if variant == "nogather":
                xw = x2d_ref[pl.ds(w, 1), :]
                g = jnp.broadcast_to(xw, (SUBLANES, 128))
            else:
                xw = x2d_ref[pl.ds(w, 1), :]
                table = jnp.broadcast_to(xw, (SUBLANES, 128))
                xw1 = x2d_ref[pl.ds(w + 1, 1), :]
                table1 = jnp.broadcast_to(xw1, (SUBLANES, 128))
                g0 = jnp.take_along_axis(table, jnp.minimum(c, 127), axis=1)
                g1 = jnp.take_along_axis(table1, jnp.maximum(c - 128, 0),
                                         axis=1)
                g = jnp.where(c < 128, g0, g1)
            p = v * g
            if variant == "noscatter":
                outb = p
            elif variant == "scatter3":
                # route each value from its current sublane s to dest
                # tsb[s,l] by fixing one position bit per stage; entries in
                # each lane column are pre-sorted by ts so collisions merge
                pos = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, 128), 0)
                cur = tsb
                for bbit in (1, 2, 4):
                    need = ((cur ^ pos) & bbit) != 0
                    mv = jnp.where(need, p, 0.0)
                    mvd = jnp.where(need, cur, 0)
                    p = jnp.where(need, 0.0, p)
                    cur = jnp.where(need, 0, cur)
                    rolled = pltpu.roll(mv, bbit, 0)
                    rolledd = pltpu.roll(mvd, bbit, 0)
                    # a rolled value lands where position bit b differs;
                    # both directions are handled by the cyclic roll in two
                    # halves: up-move for pos-bit 0 targets, down for 1
                    p = p + rolled
                    cur = cur | rolledd
                outb = p
            else:
                parts = [
                    jnp.sum(p * (tsb == ts).astype(jnp.float32), axis=0,
                            keepdims=True)
                    for ts in range(SUBLANES)
                ]
                outb = jnp.concatenate(parts, axis=0)
            slab = b * SUBLANES
            cur2 = out_ref[pl.ds(slab, SUBLANES), :]
            out_ref[pl.ds(slab, SUBLANES), :] = cur2 + outb

    return kern


def build(p: PallasSpmvScattered, variant, th=None):
    w = p.layout
    th = th or w.th
    # retile the stream to the requested th by padding rounds
    assert th == w.th, "th sweep uses repack"
    call = pl.pallas_call(
        make_kernel(w.th, variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(w.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((w.y_rows, LANES), jnp.float32),
    )
    return call


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
    for name, scale in (("uk-2002", 0.05), ("twitter7", 0.02)):
        a = datasets.emulate(name, scale=scale, dtype=np.float32)
        p = PallasSpmvScattered(a)
        w = p.layout
        x = np.random.default_rng(0).standard_normal(a.shape[1]).astype(
            np.float32)
        xp = jnp.asarray(x[p.colperm])
        pad = w.x2d_rows * 128 - a.shape[1]
        arrs = {"val": p._val, "lcol": p._lcol, "tsb": p._tsb,
                "wr": p._wr, "ob": p._ob}
        gold = np.asarray(p.apply_permuted(p.device_arrays(), xp))

        for variant in ("base", "noscatter", "nogather"):
            call = build(p, variant)

            def f(arrs, xp):
                x2d = jnp.pad(xp, (0, pad)).reshape(-1, 128)
                return call(arrs["wr"], arrs["ob"], x2d, arrs["val"],
                            arrs["lcol"], arrs["tsb"])

            def step(c, arrs, xp):
                return f(arrs, xp + c[0, :1] * _EPS)

            try:
                y0 = f(arrs, xp)
                ok = "OK" if variant == "base" and np.allclose(
                    np.asarray(y0).reshape(-1)[: a.shape[0]],
                    gold, rtol=1e-4, atol=1e-4) else "-"
                t = measure_seconds_per_iter(step, y0, arrs, xp,
                                             iters_lo=5, iters_hi=25)
                gbps = p.bytes_per_iter / t / 1e9
                print(f"{name:9s} {variant:10s} {t*1e6:7.1f} us "
                      f"{gbps:6.1f} GB/s ({100*gbps/sbw:5.1f}%) {ok}",
                      flush=True)
            except Exception as e:
                print(f"{name:9s} {variant:10s} FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
