"""Pallas TPU SpMM over dense BSR blocks — MXU matmuls, zero gathers
(SURVEY.md C6 fast path for panel-clustered matrices).

Round-3 measurement: the w-SELL SpMM kernel pays K x (2 lane-gathers +
where + segment-dot) per window group — 57 GB/s (8.6% of STREAM) at K=8 on
cant, and its ngrp*K static unroll crashes the Mosaic compiler at K=32.
The fix is structural, not parametric: for FEM-suite matrices the nonzeros
cluster into (br x 128) panels at ~0.10-0.15 density (measured cant/consph/
pdb1HYS/pwtk), so storing touched panels DENSE turns SpMM into a stream of
(br,128)@(128,K) MXU dots with no gather at all:

    per block b:  Y[brow_b] += A_block_b @ X[bcol_b]     (one dot, one RMW)

The dense-padding bytes are real HBM traffic and are counted in
bytes_per_iter (density is reported alongside, as fill is for w-SELL); the
same kernel shape serves any K, so arithmetic intensity grows K-fold at
constant traffic — the regime shift SURVEY.md §3.2 requires between K=8
and K=32.

X and Y live whole in VMEM ((n_panels*128, K) and (num_brows*br, K)); the
block stream is the only per-iteration HBM traffic beyond one pass over
X/Y.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_bsr import pack_bsr, bsr_stats

_VMEM_X_LIMIT = 16 * (1 << 20)
_VMEM_Y_LIMIT = 16 * (1 << 20)
# Transposed kernel: Xt + Yt live whole in VMEM as (k, cols)/(k, rows);
# measured compile bracket on v5e: 13.95 MB works (pwtk k8), 15.99 MB
# crashes the remote Mosaic compiler (cant k32) — ceiling set between them.
_VMEM_T_LIMIT = int(14.5 * (1 << 20))


def _kernel_t_streamed(tb, k, precision):
    """Streamed-Xt variant of _kernel_t: Xt does NOT fit VMEM whole, so the
    grid streams one ~2 MB column slice at a time — the slice index is a
    per-TILE prefetch scalar consumed by the Xt BlockSpec index_map, and
    blocks are sorted (slice, brow) so consecutive tiles reuse the resident
    slice (pallas re-DMAs only when csl[t] changes). bcol is slice-local.
    Per-range traffic = blocks + one full Xt pass; R ranges cost R*Xt extra
    (counted in bytes_per_iter). This is the single-chip analogue of the
    2D-mesh plan's column blocking (parallel/spmv2d)."""
    bf16x3 = precision == "bf16x3"
    de = jax.lax.Precision.DEFAULT

    def kern(csl_ref, brow_ref, bcol_ref, xt_ref, at_ref, out_ref):
        del csl_ref  # consumed by the Xt BlockSpec index_map
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for b in range(tb):
            i = t * tb + b
            bc = bcol_ref[i]
            brw = brow_ref[i]
            ab = at_ref[b * 128:(b + 1) * 128, :]
            if bf16x3:
                af = ab.astype(jnp.float32)
                ah = af.astype(jnp.bfloat16)
                al = (af - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            for s in range(k // 8):
                xa = xt_ref[s * 8:(s + 1) * 8, pl.ds(bc * 128, 128)]
                if bf16x3:
                    xh = xa.astype(jnp.bfloat16)
                    xl = (xa - xh.astype(jnp.float32)).astype(jnp.bfloat16)
                    p = (jnp.dot(xh, ah, preferred_element_type=jnp.float32,
                                 precision=de)
                         + jnp.dot(xh, al,
                                   preferred_element_type=jnp.float32,
                                   precision=de)
                         + jnp.dot(xl, ah,
                                   preferred_element_type=jnp.float32,
                                   precision=de))
                else:
                    p = jnp.dot(xa, ab.astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=precision)
                cur = out_ref[s * 8:(s + 1) * 8, pl.ds(brw * 128, 128)]
                out_ref[s * 8:(s + 1) * 8, pl.ds(brw * 128, 128)] = cur + p

    return kern


def _kernel_t(tb, k, precision):
    """Transposed-operand kernel: K on sublanes, columns on lanes.

    e13 measured the production (rows, K) layout at K=8 wasting 15/16 lanes
    of every vreg (xa slice 16 vregs, Y RMW 8 vregs each way) — 53-69% of
    STREAM while the block DMA alone runs at 793 GB/s. With Xt (k, cols) and
    Yt (k, rows) and blocks stored transposed (128, 128):

        xa  = xt[:, bc*128 : +128]      (8,128) slice = 1 vreg per 8 rows
        p   = dot(xa, At_b)             MXU, full 128 lanes
        rmw = yt[:, brw*128 : +128]     1 vreg per 8 rows

    which runs AT the DMA roofline (e13b/e13c: cant 206 us/778 GB/s, consph
    270 us/794 GB/s, pdb1HYS K=32 192 us/1314 GFLOP/s). k is processed in
    sublane slices of 8 — every tensor op keeps the proven-to-compile
    shapes regardless of K.
    """
    bf16x3 = precision == "bf16x3"
    de = jax.lax.Precision.DEFAULT

    def kern(brow_ref, bcol_ref, xt_ref, at_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for b in range(tb):
            i = t * tb + b
            bc = bcol_ref[i]
            brw = brow_ref[i]
            ab = at_ref[b * 128:(b + 1) * 128, :]
            if bf16x3:
                af = ab.astype(jnp.float32)
                ah = af.astype(jnp.bfloat16)
                al = (af - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            for s in range(k // 8):
                xa = xt_ref[s * 8:(s + 1) * 8, pl.ds(bc * 128, 128)]
                if bf16x3:
                    xh = xa.astype(jnp.bfloat16)
                    xl = (xa - xh.astype(jnp.float32)).astype(jnp.bfloat16)
                    p = (jnp.dot(xh, ah, preferred_element_type=jnp.float32,
                                 precision=de)
                         + jnp.dot(xh, al,
                                   preferred_element_type=jnp.float32,
                                   precision=de)
                         + jnp.dot(xl, ah,
                                   preferred_element_type=jnp.float32,
                                   precision=de))
                else:
                    p = jnp.dot(xa, ab.astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=precision)
                cur = out_ref[s * 8:(s + 1) * 8, pl.ds(brw * 128, 128)]
                out_ref[s * 8:(s + 1) * 8, pl.ds(brw * 128, 128)] = cur + p

    return kern


class PallasSpmmBsrT:
    """Transposed-operand dense-block Pallas SpMM (br = bc = 128).

    Xt lives whole in VMEM; Yt is split across ``R`` block-row ranges, each
    its own pallas_call over its slice of the (brow-sorted) block stream, so
    that Xt + Yt/R stays under the measured compile ceiling. R = 1 for
    K=8/16 everywhere; K=32 on mid-size matrices pays (R-1) extra Xt reads
    (counted in bytes_per_iter) instead of falling off the roofline. When
    Xt ALONE exceeds the ceiling (pwtk K=32: 26 MB), the STREAMED mode
    kicks in: ~2 MB Xt column slices DMA'd on demand via a per-tile
    prefetch-scalar index_map, blocks sorted (slice, brow) within each
    range so consecutive tiles reuse the resident slice; each range then
    pays one full Xt pass (R*Xt total, in bytes_per_iter)."""

    def __init__(self, a: CSR, *, tb: int = 16, min_density: float = 0.04,
                 value_dtype=None, precision=None, k_hint: int = 8):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        from .spmv_pallas import check_value_dtype

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        st = bsr_stats(a, br=128, bc=128)
        if st["density"] < min_density:
            raise ValueError(
                f"BSR density {st['density']:.3f} below {min_density} "
                "(scattered matrix); use the w-SELL/PSEG paths"
            )
        bsr = pack_bsr(a, br=128, bc=128)
        self.bsr = bsr
        self.tb = tb
        self.density = bsr.density
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        if precision is None:
            precision = (jax.lax.Precision.DEFAULT
                         if value_dtype == jnp.bfloat16 else "bf16x3")
        self.precision = precision

        kp = self._kpad(k_hint)
        # resident mode: Xt whole in VMEM; when Xt ALONE busts the compile
        # ceiling (pwtk K=32: 26 MB), fall to the STREAMED mode — ~2 MB
        # column slices of Xt DMA'd on demand via a per-tile prefetch
        # scalar, blocks sorted (slice, brow) per range
        self._slice_pcols = 0
        try:
            self.R, self._range_brows = self._plan_ranges(kp)
        except ValueError:
            self.R, self._range_brows, self._slice_pcols = (
                self._plan_streamed(kp))
        self._kp_built = kp

        # per-range streams: blocks are brow-sorted, so each range is a
        # contiguous slice, padded to a tb multiple; brow indices are local
        # to the range (out block-row 0 = range start). All ranges are then
        # padded to ONE (T_max, rb_max) shape so a single compiled
        # pallas_call serves every range: R distinct shapes used to mean R
        # sequential remote Mosaic compiles (pwtk K=32: 22 ranges x 30-60 s
        # with zero output — indistinguishable from a hang; the suite
        # watchdog killed healthy runs). Pad tiles sit at the END of each
        # stream (zero blocks aimed at the range's last block-row, keeping
        # the resident Xt slice), so they cost only their DMA bytes —
        # counted in bytes_per_iter.
        ats, brows, bcols, tiles, csls = [], [], [], [], []
        lo = 0
        base = 0
        total_blocks = 0
        for rb in self._range_brows:
            hi = int(np.searchsorted(bsr.brow, base + rb))
            cnt = hi - lo
            if self._slice_pcols:
                sp = self._slice_pcols
                cs = bsr.bcol[lo:hi] // sp
                order = np.lexsort((bsr.brow[lo:hi], cs)).astype(np.int64)
                cso = cs[order]
                gfirst = np.concatenate([[True], cso[1:] != cso[:-1]]) \
                    if cnt else np.zeros(0, bool)
                gstarts = np.flatnonzero(gfirst)
                gcounts = np.diff(np.concatenate([gstarts, [cnt]])) \
                    if cnt else np.zeros(0, np.int64)
                gpad = -(-gcounts // tb) * tb
                tot = int(max(gpad.sum(), tb))
                gbase = np.concatenate([[0], np.cumsum(gpad)[:-1]]) \
                    if len(gpad) else np.zeros(0, np.int64)
                dest = (np.repeat(gbase, gcounts)
                        + (np.arange(cnt) - np.repeat(gstarts, gcounts)))
                at = np.zeros((tot * 128, 128), np.float32)
                src = order + lo
                arows = (dest[:, None] * 128 + np.arange(128)).reshape(-1)
                at[arows] = bsr.blocks[src].transpose(0, 2, 1).reshape(
                    cnt * 128, 128)
                brow = np.full(tot, rb - 1, np.int32)
                bcol = np.zeros(tot, np.int32)
                brow[dest] = bsr.brow[src] - base
                bcol[dest] = bsr.bcol[src] - cs[order] * sp
                # per-slot slice id (pad slots inherit their group's)
                if len(gpad):
                    csl_all = np.repeat(cso[gstarts], gpad)
                    if len(csl_all) < tot:
                        csl_all = np.concatenate(
                            [csl_all,
                             np.zeros(tot - len(csl_all), np.int64)])
                else:
                    csl_all = np.zeros(tot, np.int64)
                T = tot // tb
                csls.append(csl_all[::tb].astype(np.int32))
            else:
                T = max(-(-cnt // tb), 1)
                tot = T * tb
                at = np.zeros((tot * 128, 128), np.float32)
                at[: cnt * 128] = bsr.blocks[lo:hi].transpose(0, 2, 1).reshape(
                    cnt * 128, 128)
                brow = np.zeros(tot, np.int32)
                bcol = np.zeros(tot, np.int32)
                brow[:cnt] = bsr.brow[lo:hi] - base
                bcol[:cnt] = bsr.bcol[lo:hi]
                brow[cnt:] = rb - 1
            ats.append(at)
            brows.append(brow)
            bcols.append(bcol)
            tiles.append(T)
            lo = hi
            base += rb
        # unify: pad every range to T_max tiles (zero blocks -> last local
        # block-row, resident slice) so one pallas_call shape fits all
        t_max = max(tiles)
        for i, (rb, T) in enumerate(zip(self._range_brows, tiles)):
            extra = (t_max - T) * tb
            if extra:
                ats[i] = np.concatenate(
                    [ats[i], np.zeros((extra * 128, 128), np.float32)])
                brows[i] = np.concatenate(
                    [brows[i], np.full(extra, rb - 1, np.int32)])
                bcols[i] = np.concatenate(
                    [bcols[i], np.zeros(extra, np.int32)])
                if self._slice_pcols:
                    last = csls[i][-1] if len(csls[i]) else np.int32(0)
                    csls[i] = np.concatenate(
                        [csls[i], np.full(t_max - T, last, np.int32)])
            total_blocks += t_max * tb
        self._ats = tuple(jnp.asarray(a).astype(value_dtype) for a in ats)
        self._brows = tuple(jnp.asarray(b) for b in brows)
        self._bcols = tuple(jnp.asarray(b) for b in bcols)
        self._tiles = (t_max,) * self.R
        self._rb_max = max(self._range_brows)
        self._csls = tuple(jnp.asarray(c) for c in csls)
        xt_bytes = self._kp_built * bsr.num_bcols * 128 * 4
        self.bytes_per_iter = (
            total_blocks * 128 * 128 * value_dtype.itemsize
            + total_blocks * 8
            + ((self.R * xt_bytes) if self._slice_pcols
               else (self.R - 1) * xt_bytes)  # Xt (re-)staged per range
        )
        self._calls = {}

    def _plan_streamed(self, kp: int):
        """(R, range_brows, slice_pcols) for the streamed-Xt mode."""
        bsr = self.bsr
        # ~2 MB slices (or an eighth of the ceiling, whichever is smaller,
        # so slices never crowd out Yt)
        sb = min(2 << 20, _VMEM_T_LIMIT // 8)
        slice_pcols = max(1, sb // (kp * 128 * 4))
        slice_pcols = min(slice_pcols, bsr.num_bcols)
        sbytes = kp * slice_pcols * 128 * 4
        budget = _VMEM_T_LIMIT - 2 * sbytes   # slice is double-buffered
        per_brow = kp * 128 * 4
        if budget < 8 * per_brow:
            raise ValueError(
                f"k={kp} per-brow Yt ({per_brow} B) too big even with "
                "streamed Xt; use the (rows, K) BSR path"
            )
        rows = min(int(budget // per_brow), bsr.num_brows)
        R = -(-bsr.num_brows // rows)
        base = bsr.num_brows // R
        rem = bsr.num_brows - base * R
        return (R, tuple(base + (1 if i < rem else 0) for i in range(R)),
                slice_pcols)

    def _kpad(self, k: int) -> int:
        return -(-k // 8) * 8

    def _plan_ranges(self, kp: int):
        """Split num_brows into R ranges st Xt + per-range Yt fits."""
        bsr = self.bsr
        xt = kp * bsr.num_bcols * 128 * 4
        budget = _VMEM_T_LIMIT - xt
        per_brow = kp * 128 * 4
        if budget < 8 * per_brow:
            raise ValueError(
                f"Xt ({xt >> 20} MB at k={kp}) leaves no VMEM for Yt; "
                "use the (rows, K) BSR path"
            )
        rows = min(int(budget // per_brow), bsr.num_brows)
        R = -(-bsr.num_brows // rows)
        # equalize: R ranges of ~num_brows/R rows each
        base = bsr.num_brows // R
        rem = bsr.num_brows - base * R
        return R, tuple(base + (1 if i < rem else 0) for i in range(R))

    def _get_calls(self, k: int):
        kp = self._kpad(k)
        if kp in self._calls:
            return self._calls[kp]
        if self._slice_pcols:
            if self._plan_streamed(kp)[2] != self._slice_pcols:
                raise ValueError(
                    f"k={k} needs a different Xt slicing (built for "
                    f"k_hint={self._kp_built}); rebuild with k_hint={k}"
                )
        elif self._plan_ranges(kp)[0] != self.R:
            raise ValueError(
                f"k={k} needs a different block-row split (built for "
                f"k_hint={self._kp_built}); rebuild the plan with k_hint={k}"
            )
        from ...utils.backend import on_cpu
        interpret = on_cpu()
        # ONE call shape for every range (streams were padded to a common
        # (T_max, rb_max) in __init__): one Mosaic compile instead of R
        T = self._tiles[0]
        rb = self._rb_max
        if self._slice_pcols:
            sp_ = self._slice_pcols
            call = pl.pallas_call(
                _kernel_t_streamed(self.tb, kp, self.precision),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(T,),
                    in_specs=[
                        # Xt slice picked by the tile's prefetch scalar
                        pl.BlockSpec(
                            (kp, sp_ * 128),
                            lambda t, cs_, br_, bc_: (0, cs_[t])),
                        pl.BlockSpec((self.tb * 128, 128),
                                     lambda t, cs_, br_, bc_: (t, 0)),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((kp, rb * 128),
                                               jnp.float32),
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=int(2 * T * self.tb * 128 * 128 * kp),
                    bytes_accessed=int(
                        T * self.tb * 128 * 128
                        * self.value_dtype.itemsize
                        + kp * (self.bsr.num_bcols + rb) * 128 * 4),
                    transcendentals=0,
                ),
            )
        else:
            call = pl.pallas_call(
                _kernel_t(self.tb, kp, self.precision),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(T,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),  # Xt
                        pl.BlockSpec((self.tb * 128, 128),
                                     lambda t, br_, bc_: (t, 0)),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((kp, rb * 128),
                                               jnp.float32),
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=int(2 * T * self.tb * 128 * 128 * kp),
                    bytes_accessed=int(
                        T * self.tb * 128 * 128
                        * self.value_dtype.itemsize
                        + kp * (self.bsr.num_bcols + rb) * 128 * 4),
                    transcendentals=0,
                ),
            )
        calls = [call] * self.R
        self._calls[kp] = calls
        return calls

    def device_arrays(self):
        d = {"brow": self._brows, "bcol": self._bcols, "at": self._ats}
        if self._slice_pcols:
            d["csl"] = self._csls
        return d

    def apply_pure(self, arrs, x):
        m, n = self.shape
        k = x.shape[1]
        kp = self._kpad(k)
        calls = self._get_calls(k)
        if self._slice_pcols:
            nslices = -(-self.bsr.num_bcols // self._slice_pcols)
            pad = nslices * self._slice_pcols * 128 - n
        else:
            pad = self.bsr.num_bcols * 128 - n
        xt = jnp.pad(x.astype(jnp.float32),
                     ((0, pad), (0, kp - k))).T        # (kp, cols)
        if self._slice_pcols:
            parts = [
                call(csl, brow, bcol, xt, at)[:, :rb * 128]
                for call, csl, brow, bcol, at, rb in zip(
                    calls, arrs["csl"], arrs["brow"], arrs["bcol"],
                    arrs["at"], self._range_brows)
            ]
        else:
            parts = [
                call(brow, bcol, xt, at)[:, :rb * 128]
                for call, brow, bcol, at, rb in zip(
                    calls, arrs["brow"], arrs["bcol"], arrs["at"],
                    self._range_brows)
            ]
        yt = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        return yt[:k, :m].T.astype(self.dtype)

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out


def _kernel(br, tb, precision):
    bf16x3 = precision == "bf16x3"

    def kern(brow_ref, bcol_ref, x_ref, blk_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for b in range(tb):
            i = t * tb + b
            bc = bcol_ref[i]
            brw = brow_ref[i]
            a = blk_ref[b * br:(b + 1) * br, :].astype(jnp.float32)
            xa = x_ref[pl.ds(bc * 128, 128), :]
            if bf16x3:
                # manual 3-pass f32: a_hi@x_hi + a_hi@x_lo + a_lo@x_hi.
                # Measured (e11, cant): ~2e-5 closer-than-f32-mul error at
                # half the MXU passes of HIGHEST (257 vs 361 us at K=8).
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
            slab = brw * br
            cur = out_ref[pl.ds(slab, br), :]
            out_ref[pl.ds(slab, br), :] = cur + p

    return kern


class PallasSpmmBsr:
    """Dense-block Pallas SpMM executor (fixed K per call; compiled per K)."""

    def __init__(self, a: CSR, *, br: int = 64, tb: int = 16,
                 min_density: float = 0.04, value_dtype=None,
                 precision=None):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        from .spmv_pallas import check_value_dtype

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        st = bsr_stats(a, br=br, bc=128)
        if st["density"] < min_density:
            raise ValueError(
                f"BSR density {st['density']:.3f} below {min_density} "
                "(scattered matrix); use the w-SELL/PSEG paths"
            )
        bsr = pack_bsr(a, br=br, bc=128)
        self.bsr = bsr
        self.br = br
        self.tb = tb
        self.density = bsr.density
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        # Mosaic supports only DEFAULT (1 bf16 pass, ~1e-3 rounding) and
        # HIGHEST (~f32, 6 passes) dot precision. The default for f32
        # values is a manual 3-pass bf16 split ("bf16x3"): ~7e-6 rel-err at
        # 1.4x the speed of HIGHEST (measured, e11). bf16 value streams are
        # exact in one DEFAULT pass.
        if precision is None:
            precision = (jax.lax.Precision.DEFAULT
                         if value_dtype == jnp.bfloat16 else "bf16x3")
        self.precision = precision

        nb = bsr.nblocks
        T = -(-nb // tb)
        total = T * tb
        blocks = np.zeros((total * br, 128), np.float32)
        blocks[: nb * br] = bsr.blocks.reshape(nb * br, 128)
        brow = np.zeros(total, np.int32)
        bcol = np.zeros(total, np.int32)
        brow[:nb] = bsr.brow
        bcol[:nb] = bsr.bcol
        # pad blocks are all-zero; route them at the last block-row slab
        brow[nb:] = bsr.num_brows - 1
        self.num_tiles = T
        self.bytes_per_iter = (blocks.size * value_dtype.itemsize
                               + total * 8)
        self._blocks = jnp.asarray(blocks).astype(value_dtype)
        self._brow = jnp.asarray(brow)
        self._bcol = jnp.asarray(bcol)
        self._calls = {}

    def _get_call(self, k: int):
        if k in self._calls:
            return self._calls[k]
        bsr = self.bsr
        if bsr.num_bcols * 128 * k * 4 > _VMEM_X_LIMIT:
            raise ValueError("X exceeds VMEM staging limit for bsr spmm")
        if bsr.num_brows * self.br * k * 4 > _VMEM_Y_LIMIT:
            raise ValueError("Y exceeds VMEM accumulator limit for bsr spmm")
        from ...utils.backend import on_cpu
        interpret = on_cpu()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(self.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # X whole
                pl.BlockSpec((self.tb * self.br, 128),
                             lambda t, br_, bc_: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(self.br, self.tb, self.precision),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (bsr.num_brows * self.br, k), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * self.num_tiles * self.tb * self.br * 128 * k),
                bytes_accessed=int(self.bytes_per_iter
                                   + (bsr.num_bcols + bsr.num_brows)
                                   * 128 * k * 4),
                transcendentals=0,
            ),
        )
        self._calls[k] = call
        return call

    def device_arrays(self):
        return {"brow": self._brow, "bcol": self._bcol,
                "blocks": self._blocks}

    def apply_pure(self, arrs, x):
        m, n = self.shape
        k = x.shape[1]
        call = self._get_call(k)
        pad = self.bsr.num_bcols * 128 - n
        xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
        y = call(arrs["brow"], arrs["bcol"], xp, arrs["blocks"])
        return y[:m].astype(self.dtype)

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out
