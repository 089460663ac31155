"""Pallas TPU SpMV kernel over the w-SELL v3 layout (SURVEY.md C5 fast path).

Both x (as x2d[*,128]) and the FULL y accumulator live in VMEM; the nnz
stream (val/lcol tiles of (th x 128), ~256 KB per grid step to amortize the
measured ~300-400 ns step overhead) is the only HBM traffic besides one
pass over x and y. Per (8 x 128) round inside a tile:

  1. dynamic-slice the round's 128-wide x window out of x2d, broadcast to 8
     sublanes,
  2. `take_along_axis(..., axis=1)` — the per-sublane lane-gather, the only
     gather Mosaic v5e supports (97.5% of STREAM in a streaming
     microbenchmark, experiments/e5); no masking — a round's columns live in
     one panel by construction,
  3. multiply, reduce each row segment's lanes via a constant 0/1 segment
     matrix on the MXU — by default as 3 DEFAULT-precision passes over a
     bf16 hi/mid/lo split of the products (identical error to HIGHEST at
     ~half the MXU passes; e10c) — and accumulate into the round's 8-row
     slab of the VMEM-resident y.

XLA's own gather/scatter lowers to ~1 GB/s serial code on TPU (measured), so
this kernel IS the single-chip fast path; f64 (no Mosaic support) and
scattered matrices fall back to the XLA paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_wsell import pack_wsell, pick_sub, SUBLANES, LANES

_VMEM_X_LIMIT = 24 * (1 << 20)   # stage x fully in VMEM up to this size
_VMEM_Y_LIMIT = 8 * (1 << 20)    # y accumulator cap (whole-y mode)
_YBLOCKS = 512                   # row blocks per resident y block (4096
#                                  y2d rows = 2 MB physical) in blocked mode


def check_value_dtype(value_dtype):
    """Validate the opt-in value-stream dtype (shared by all Pallas paths).

    bf16 halves the dominant HBM stream (~12 -> ~8 B/nnz with int16 lcol)
    at ~1e-3 value rounding; the gather and accumulation stay f32 (every
    kernel upcasts), and bf16 is native on the VPU/MXU. x/y remain f32.
    """
    vd = jnp.dtype(value_dtype or jnp.float32)
    if vd not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"value_dtype must be f32 or bf16, got {vd}")
    return vd


def _kernel(th, sub, nwin, wgroup, dot: str = "split3"):
    lps = LANES // sub
    ns = th // SUBLANES
    ngrp = ns // wgroup
    gh = wgroup * SUBLANES        # rows per window group

    def kern(wrow_ref, obase_ref, x2d_ref, val_ref, col_ref, out_ref):
        t = pl.program_id(0)

        def rmeta(ref, i):
            return ref[t * ns + i]

        seg = (jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 0) // lps
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 1)
               ).astype(jnp.float32)
        segb = seg.astype(jnp.bfloat16)   # 0/1: exact in bf16

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # Static unroll: Mosaic does not pipeline fori_loop iterations
        # (measured 80 ns/iteration of pure loop overhead).
        for q in range(ngrp):
            w = rmeta(wrow_ref, q * wgroup)
            v = val_ref[q * gh:(q + 1) * gh, :].astype(jnp.float32)
            c = col_ref[q * gh:(q + 1) * gh, :].astype(jnp.int32)
            xw = x2d_ref[pl.ds(w, 1), :]                    # (1, 128)
            table = jnp.broadcast_to(xw, (gh, 128))
            if nwin == 1:
                g = jnp.take_along_axis(table, c, axis=1)
            else:
                xw1 = x2d_ref[pl.ds(w + 1, 1), :]
                table1 = jnp.broadcast_to(xw1, (gh, 128))
                g0 = jnp.take_along_axis(table, jnp.minimum(c, 127), axis=1)
                g1 = jnp.take_along_axis(table1, jnp.maximum(c - 128, 0),
                                         axis=1)
                g = jnp.where(c < 128, g0, g1)
            vg = v * g
            if dot == "split3":
                # Segment-reduce via 3 DEFAULT MXU passes on a bf16
                # hi/mid/lo split of vg (seg is 0/1, exact in bf16) —
                # measured identical error to HIGHEST at ~half the MXU
                # cost (e10c, round 3). Mosaic has no HIGH precision and
                # pltpu.roll reductions are 3.6x slower (e10b).
                de = jax.lax.Precision.DEFAULT
                hi = vg.astype(jnp.bfloat16)
                r = vg - hi.astype(jnp.float32)
                mid = r.astype(jnp.bfloat16)
                lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                part = (jnp.dot(hi, segb, preferred_element_type=jnp.float32,
                                precision=de)
                        + jnp.dot(mid, segb,
                                  preferred_element_type=jnp.float32,
                                  precision=de)
                        + jnp.dot(lo, segb,
                                  preferred_element_type=jnp.float32,
                                  precision=de))
            else:
                part = jnp.dot(vg, seg,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            for j in range(wgroup):
                b = rmeta(obase_ref, q * wgroup + j)
                slab = b * SUBLANES
                cur = out_ref[pl.ds(slab, SUBLANES), :]
                out_ref[pl.ds(slab, SUBLANES), :] = (
                    cur + part[j * SUBLANES:(j + 1) * SUBLANES]
                )

    return kern


class PallasSpmv:
    """w-SELL Pallas SpMV executor for one CSR matrix."""

    # wgroup=4: window runs pad to the group size, and the e15b sweep
    # (round 4) measured wg4 fastest or within noise on the whole FEM suite
    # (cant 85.2 -> 69.8 us, pwtk 294.6 -> 213.7 us vs the old wg8) — the
    # extra slice+gather per 4 rounds costs less than the run padding.
    def __init__(self, a: CSR, *, th: int = 0, sub: int = 0,
                 nwin: int = 2, wgroup: int = 4, min_fill: float = 0.2,
                 value_dtype=None, dot: str = "split3"):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        x_bytes = (-(-n // 128) + 1) * 128 * 4
        if x_bytes > _VMEM_X_LIMIT:
            raise ValueError(
                f"x ({x_bytes >> 20} MB) exceeds VMEM staging limit; "
                "use the XLA path or the multi-chip partitioner"
            )
        self.dot = dot
        # Physical bytes: a (y_rows, sub) out buffer lane-pads sub -> 128
        # in VMEM, so it costs y_rows*128*4 regardless of sub (measured:
        # m=1M, sub=16 -> 32 MB physical vs 4 MB nominal; crashed the
        # remote compiler when the guard counted nominal bytes). Beyond
        # that (~262K rows at sub=16), switch to the BLOCKED-Y layout:
        # rounds sorted y-block-major with block-local obase, solved as
        # one pallas_call per 4096-row y block (see __init__ below).
        sub_eff = sub if sub > 0 else pick_sub(a)
        y_rows_est = (-(-max(m, 1) // (SUBLANES * sub_eff))) * SUBLANES
        yblocks = _YBLOCKS if y_rows_est * LANES * 4 > _VMEM_Y_LIMIT else 0
        w = pack_wsell(a, th=th, sub=sub_eff, nwin=nwin, wgroup=wgroup,
                       yblocks=yblocks)
        if w.fill < min_fill:
            raise ValueError(
                f"w-SELL fill {w.fill:.2f} below {min_fill} (scattered "
                "columns); use the XLA bucket path"
            )
        self.layout = w
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        self.bytes_per_iter = (w.bytes_per_iter + n * 4 + m * 4
                               - w.val.size * (4 - value_dtype.itemsize))
        self.lcol_itemsize = w.lcol.itemsize
        self.blocked = w.tile_yblk is not None
        if self.blocked:
            # ONE pallas_call per y block, each over its contiguous tile
            # slice with its own (small) prefetch-scalar arrays. Whole-run
            # scalar prefetch busts SMEM beyond ~130K rounds (fem-band-1M:
            # 240K rounds = 2 MB of (wrow, obase) -> HTTP-500 compile
            # crash at every th), and SMEM-streamed (ns,) metadata
            # BlockSpecs crash the Mosaic compiler outright (measured on
            # the 500K case that compiles fine with prefetch scalars).
            # Per-call cost: one x2d re-stage (4 MB at m=1M, ~6% extra
            # traffic over the schedule stream).
            ns = w.th // SUBLANES
            tile_of = np.asarray(w.tile_yblk)
            bounds = np.searchsorted(tile_of, np.arange(w.num_yblks + 1))
            self._blk_tiles = tuple(int(bounds[g + 1] - bounds[g])
                                    for g in range(w.num_yblks))
            vals, lcols, wrs, obs = [], [], [], []
            for g in range(w.num_yblks):
                t0, t1 = int(bounds[g]), int(bounds[g + 1])
                vals.append(jnp.asarray(
                    w.val[t0 * w.th: t1 * w.th]).astype(value_dtype))
                lcols.append(jnp.asarray(w.lcol[t0 * w.th: t1 * w.th]))
                wrs.append(jnp.asarray(w.round_wrow[t0 * ns: t1 * ns]))
                obs.append(jnp.asarray(w.round_obase[t0 * ns: t1 * ns]))
            self._val = tuple(vals)
            self._lcol = tuple(lcols)
            self._wr = tuple(wrs)
            self._ob = tuple(obs)
            self._calls = tuple(self._build_one(T) for T in self._blk_tiles)
        else:
            self._val = jnp.asarray(w.val).astype(value_dtype)
            self._lcol = jnp.asarray(w.lcol)
            self._wr = jnp.asarray(w.round_wrow)
            self._ob = jnp.asarray(w.round_obase)
            self._call = self._build_one(w.num_tiles)

    def _build_one(self, T):
        """pallas_call over T tiles writing one whole-VMEM y buffer (the
        full y when unblocked; one y block when blocked — obase is local)."""
        w = self.layout
        from ...utils.backend import on_cpu
        interpret = on_cpu()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d, whole
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # whole y blk
        )
        out_rows = w.yb_rows if self.blocked else w.y_rows

        return pl.pallas_call(
            _kernel(w.th, w.sub, w.nwin, w.wgroup, self.dot),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, w.sub), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * T * w.th * LANES),
                bytes_accessed=int(T * w.th * LANES
                                   * (self.value_dtype.itemsize
                                      + self.lcol_itemsize)
                                   + out_rows * w.sub * 4),
                transcendentals=0,
            ),
        )

    def device_arrays(self):
        return {"wr": self._wr, "ob": self._ob,
                "val": self._val, "lcol": self._lcol}

    def apply_pure(self, arrs, x):
        m, n = self.shape
        w = self.layout
        pad = w.x2d_rows * 128 - n
        x2d = jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(-1, 128)
        if self.blocked:
            parts = [
                call(wr, ob, x2d, val, lcol)
                for call, wr, ob, val, lcol in zip(
                    self._calls, arrs["wr"], arrs["ob"], arrs["val"],
                    arrs["lcol"])
            ]
            y = jnp.concatenate(parts, axis=0)
        else:
            y = self._call(arrs["wr"], arrs["ob"], x2d, arrs["val"],
                           arrs["lcol"])
        return y.reshape(-1)[:m].astype(self.dtype)

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out
