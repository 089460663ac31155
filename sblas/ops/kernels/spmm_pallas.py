"""Pallas TPU SpMM kernel over the w-SELL v3 layout (SURVEY.md C6).

Same nnz stream and window-group structure as spmv_pallas; per window group
the kernel loops over the K dense columns, gathering each column's 128-wide
X panel (X is staged in VMEM transposed as Xt[k, n_panels, 128]) and
accumulating a (group_rows, sub) partial per column into the (y_rows,
k*sub) VMEM output. Arithmetic intensity grows K-fold over SpMV at the same
stream traffic, so large K shifts the kernel from bandwidth- to VPU-bound —
exactly the regime shift the reference observes between K=8 and K=32
(SURVEY.md §3.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_wsell import pack_wsell, pick_sub, SUBLANES, LANES

_VMEM_XT_LIMIT = 24 * (1 << 20)
_VMEM_Y_LIMIT = 24 * (1 << 20)
_YBLOCKS = 512    # row blocks per resident y block in blocked mode (matches
#                   spmv_pallas; 4096 y2d rows)


def _kernel(th, sub, nwin, wgroup, k):
    lps = LANES // sub
    ns = th // SUBLANES
    ngrp = ns // wgroup
    gh = wgroup * SUBLANES

    def kern(wrow_ref, obase_ref, xt_ref, val_ref, col_ref, out_ref):
        t = pl.program_id(0)

        seg = (jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 0) // lps
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 1)
               ).astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for q in range(ngrp):
            w = wrow_ref[t * ns + q * wgroup]
            v = val_ref[q * gh:(q + 1) * gh, :].astype(jnp.float32)
            c = col_ref[q * gh:(q + 1) * gh, :].astype(jnp.int32)
            c0 = jnp.minimum(c, 127)
            c1 = jnp.maximum(c - 128, 0)
            sel = c < 128
            for kk in range(k):
                xw = xt_ref[kk, pl.ds(w, 1), :]
                table = jnp.broadcast_to(xw, (gh, 128))
                if nwin == 1:
                    g = jnp.take_along_axis(table, c, axis=1)
                else:
                    xw1 = xt_ref[kk, pl.ds(w + 1, 1), :]
                    table1 = jnp.broadcast_to(xw1, (gh, 128))
                    g0 = jnp.take_along_axis(table, c0, axis=1)
                    g1 = jnp.take_along_axis(table1, c1, axis=1)
                    g = jnp.where(sel, g0, g1)
                part = jnp.dot(v * g, seg,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                for j in range(wgroup):
                    b = obase_ref[t * ns + q * wgroup + j]
                    slab = b * SUBLANES
                    cur = out_ref[pl.ds(slab, SUBLANES),
                                  kk * sub:(kk + 1) * sub]
                    out_ref[pl.ds(slab, SUBLANES),
                            kk * sub:(kk + 1) * sub] = (
                        cur + part[j * SUBLANES:(j + 1) * SUBLANES]
                    )

    return kern


class PallasSpmm:
    """w-SELL Pallas SpMM executor for one CSR matrix (fixed K per call
    signature; compiled per K)."""

    def __init__(self, a: CSR, *, th: int = 1024, sub: int = 0,
                 nwin: int = 2, wgroup: int = 4, min_fill: float = 0.2,
                 value_dtype=None, k_hint: int = 8):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        from .spmv_pallas import check_value_dtype

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        # BLOCKED-Y + WINDOWED-X mode for matrices where Xt (k, x2d_rows,
        # 128) or the y accumulator busts VMEM whole (fem-band-1M at K=8:
        # Xt 32 MB -> the old guard pushed the auto chain into the 569 ms
        # XLA ell fallback, 0.25% of STREAM). Rounds are packed y-block-
        # major (one pallas_call per 4096-row y block, as blocked spmv);
        # each block's rounds touch only x panels in [min(wrow),
        # max(wrow)+nwin), so the call stages just that SLICE of Xt — on
        # banded/FEM locality the per-block window is narrow. All blocks
        # pad to one (T_max, win) shape: a single Mosaic compile serves
        # every block.
        sub_eff = sub if sub > 0 else pick_sub(a)
        x2d_rows_est = -(-n // 128) + 1
        y_rows_est = (-(-max(m, 1) // (SUBLANES * sub_eff))) * SUBLANES
        kh = max(k_hint, 1)
        self.blocked = (kh * x2d_rows_est * 128 * 4 > _VMEM_XT_LIMIT
                        or y_rows_est * max(kh * sub_eff, 128) * 4
                        > _VMEM_Y_LIMIT)
        w = pack_wsell(a, th=th, sub=sub_eff, nwin=nwin, wgroup=wgroup,
                       yblocks=_YBLOCKS if self.blocked else 0)
        if w.fill < min_fill:
            raise ValueError(
                f"w-SELL fill {w.fill:.2f} below {min_fill}; use the XLA path"
            )
        self.layout = w
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        self.bytes_per_iter = (w.bytes_per_iter
                               - w.val.size * (4 - value_dtype.itemsize))
        self._calls = {}
        self._kp_built = kh
        self.win = 0
        self.t_max = 0
        if self.blocked:
            self._init_blocked(w, value_dtype, kh)
            return
        self._val = jnp.asarray(w.val).astype(value_dtype)
        self._lcol = jnp.asarray(w.lcol)
        self._wr = jnp.asarray(w.round_wrow)
        self._ob = jnp.asarray(w.round_obase)

    def _init_blocked(self, w, value_dtype, kh: int):
        ns = w.th // SUBLANES
        tile_of = np.asarray(w.tile_yblk)
        bounds = np.searchsorted(tile_of, np.arange(w.num_yblks + 1))
        # per-block x window from the round wrows (pad rounds inherit real
        # windows in the packer, so min/max are tight)
        los, his = [], []
        for g in range(w.num_yblks):
            wr = w.round_wrow[bounds[g] * ns: bounds[g + 1] * ns]
            los.append(int(wr.min()))     # never empty: >= 1 tile per block
            his.append(int(wr.max()) + w.nwin)
        win = max(hi - lo for lo, hi in zip(los, his))
        win = -(-win // SUBLANES) * SUBLANES
        if kh * win * 128 * 4 > _VMEM_XT_LIMIT:
            raise ValueError(
                f"x window ({win} panels at k={kh}) exceeds the VMEM "
                "staging limit (columns too scattered for the windowed-x "
                "mode); use the PSEG/XLA paths"
            )
        self.win = win
        self.x2d_rows_pad = max(w.x2d_rows, max(lo + win for lo in los))
        self._blk_lo = tuple(los)
        t_max = int(max(bounds[g + 1] - bounds[g]
                        for g in range(w.num_yblks)))
        self.t_max = t_max
        vals, lcols, wrs, obs = [], [], [], []
        for g in range(w.num_yblks):
            t0, t1 = int(bounds[g]), int(bounds[g + 1])
            T = t1 - t0
            val = w.val[t0 * w.th: t1 * w.th]
            lcol = w.lcol[t0 * w.th: t1 * w.th]
            wr = w.round_wrow[t0 * ns: t1 * ns] - los[g]
            ob = w.round_obase[t0 * ns: t1 * ns]
            if T < t_max:
                pad_t = t_max - T
                val = np.concatenate(
                    [val, np.zeros((pad_t * w.th, LANES), val.dtype)])
                lcol = np.concatenate(
                    [lcol, np.zeros((pad_t * w.th, LANES), lcol.dtype)])
                last_wr = wr[-1] if len(wr) else 0
                wr = np.concatenate(
                    [wr, np.full(pad_t * ns, last_wr, wr.dtype)])
                ob = np.concatenate([ob, np.zeros(pad_t * ns, ob.dtype)])
            vals.append(jnp.asarray(val).astype(value_dtype))
            lcols.append(jnp.asarray(lcol))
            wrs.append(jnp.asarray(wr))
            obs.append(jnp.asarray(ob))
        self._val = tuple(vals)
        self._lcol = tuple(lcols)
        self._wr = tuple(wrs)
        self._ob = tuple(obs)
        # schedule stream grows to the padded t_max; x-window re-staging
        # (slice copy + kernel DMA) is k-dependent — counted with k_hint
        self.bytes_per_iter = (
            w.num_yblks * t_max * w.th * LANES
            * (value_dtype.itemsize + w.lcol.itemsize)
            + w.num_yblks * t_max * ns * 8
            + 2 * w.num_yblks * self.win * 128 * kh * 4
        )

    def _get_call(self, k: int):
        if k in self._calls:
            return self._calls[k]
        w = self.layout
        n = self.shape[1]
        xt_rows = self.win if self.blocked else w.x2d_rows
        if k * xt_rows * 128 * 4 > _VMEM_XT_LIMIT:
            raise ValueError("X exceeds VMEM staging limit for pallas spmm")
        # The kernel statically unrolls ngrp*k bodies per grid step; measured
        # on v5e, ~1024 bodies (th=1024, wgroup=4, k=32) crashes the Mosaic
        # compiler. Refuse past ~the known-good size so callers fall back.
        ngrp = (w.th // SUBLANES) // w.wgroup
        if ngrp * k > 512:
            raise ValueError(
                f"pallas spmm unroll ngrp*k = {ngrp * k} exceeds the Mosaic "
                "compile budget; use the bsr_pallas or XLA path for this K"
            )
        out_rows = w.yb_rows if self.blocked else w.y_rows
        if out_rows * max(w.sub * k, 128) * 4 > _VMEM_Y_LIMIT:
            raise ValueError("Y exceeds VMEM accumulator limit")
        T = self.t_max if self.blocked else w.num_tiles
        from ...utils.backend import on_cpu
        interpret = on_cpu()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Xt (whole / window)
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(w.th, w.sub, w.nwin, w.wgroup, k),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, k * w.sub),
                                           jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * T * w.th * LANES * k),
                bytes_accessed=int(T * w.th * LANES
                                   * (self.value_dtype.itemsize
                                      + w.lcol.itemsize)
                                   + (xt_rows + out_rows) * 128 * k * 4),
                transcendentals=0,
            ),
        )
        self._calls[k] = call
        return call

    def device_arrays(self):
        return {"wr": self._wr, "ob": self._ob,
                "val": self._val, "lcol": self._lcol}

    def apply_pure(self, arrs, x):
        m, n = self.shape
        w = self.layout
        k = x.shape[1]
        call = self._get_call(k)
        x2d_rows = self.x2d_rows_pad if self.blocked else w.x2d_rows
        pad = x2d_rows * 128 - n
        xt = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
        xt = xt.reshape(x2d_rows, 128, k).transpose(2, 0, 1)  # (k, rows, 128)
        if self.blocked:
            parts = [
                call(wr, ob,
                     jax.lax.slice_in_dim(xt, lo, lo + self.win, axis=1),
                     val, lcol)
                for wr, ob, val, lcol, lo in zip(
                    arrs["wr"], arrs["ob"], arrs["val"], arrs["lcol"],
                    self._blk_lo)
            ]
            y = jnp.concatenate(parts, axis=0)
            y_rows = w.num_yblks * w.yb_rows
        else:
            y = call(arrs["wr"], arrs["ob"], xt, arrs["val"], arrs["lcol"])
            y_rows = w.y_rows
        # (y_rows, k*sub) -> y[row, kk]; row = blk*8*sub + s*sub + kseg
        y = y.reshape(y_rows, k, w.sub).transpose(0, 2, 1)
        return y.reshape(-1, k)[:m].astype(self.dtype)

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out
