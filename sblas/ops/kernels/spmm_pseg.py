"""Pallas TPU SpMM kernel over the PSEG layout (scattered/power-law SpMM —
the SpMM half of BASELINE config #5's graph workloads).

Same rounds as spmv_pseg — including the HYBRID hub+tail packing and the
heavy-row split (a plain win2 pack of a Zipf graph shatters: the
powerlaw-1M SpMM crashed the compiler on ~2M rounds of prefetch scalars
before this executor shared spmv_pseg's packing). Per round the kernel
loops over the K dense columns (X staged in VMEM transposed as
Xt[kc, x2d_rows, 128]), gathering each column's window and scattering the
(8,128) partial into that column's block of the stacked (kc*y_rows, 128)
VMEM output. K is chunked so Xt + Y together stay inside VMEM (m=1M means
kc=1: k passes over the schedule — gather-bound but correct).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_pseg import pack_pseg, pack_pseg_hybrid, SUBLANES, LANES
from .spmv_pseg import hub_relabel, split_heavy_rows


def _kernel(th, kc, y_rows, tail: bool = False):
    ns = th // SUBLANES

    def kern(wrow_ref, oblk_ref, xt_ref, val_ref, col_ref, tsb_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for i in range(ns):
            w = wrow_ref[t * ns + i]
            b = oblk_ref[t * ns + i]
            v = val_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.float32)
            c = col_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.int32)
            tsb = tsb_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.int32)
            c0 = jnp.minimum(c, 127)
            c1 = jnp.maximum(c - 128, 0)
            sel = c < 128
            masks = [(tsb == ts).astype(jnp.float32)
                     for ts in range(SUBLANES)]
            for kk in range(kc):
                if tail:
                    # panel-bound tail rounds: slot sublane s reads panel
                    # w+s (lcol < 128) or w+8+s — two direct (8,128) slices
                    x8a = xt_ref[kk, pl.ds(w, SUBLANES), :]
                    x8b = xt_ref[kk, pl.ds(w + SUBLANES, SUBLANES), :]
                    g0 = jnp.take_along_axis(x8a, c0, axis=1)
                    g1 = jnp.take_along_axis(x8b, c1, axis=1)
                else:
                    xw = xt_ref[kk, pl.ds(w, 1), :]
                    table = jnp.broadcast_to(xw, (SUBLANES, 128))
                    xw1 = xt_ref[kk, pl.ds(w + 1, 1), :]
                    table1 = jnp.broadcast_to(xw1, (SUBLANES, 128))
                    g0 = jnp.take_along_axis(table, c0, axis=1)
                    g1 = jnp.take_along_axis(table1, c1, axis=1)
                g = jnp.where(sel, g0, g1)
                p = v * g
                parts = [jnp.sum(p * mk, axis=0, keepdims=True)
                         for mk in masks]
                outb = jnp.concatenate(parts, axis=0)      # (8, 128)
                slab = kk * y_rows + b * SUBLANES
                cur = out_ref[pl.ds(slab, SUBLANES), :]
                out_ref[pl.ds(slab, SUBLANES), :] = cur + outb

    return kern


class PallasSpmmScattered:
    """PSEG Pallas SpMM executor with hub relabeling (single chip)."""

    def __init__(self, a: CSR, *, th: int = 256, min_fill: float = 0.10,
                 reorder: bool = True, value_dtype=None,
                 hybrid: bool | None = None):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        from .spmv_pallas import check_value_dtype
        from ...utils.backend import on_cpu

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        if reorder:
            ap, colperm, rowperm = hub_relabel(a)
        else:
            colperm = np.arange(n, dtype=np.int64)
            rowperm = np.arange(m, dtype=np.int64)
            ap = a
        # mega-rows shatter the round packing (see spmv_pseg); deal them
        # into virtual sub-rows merged per column at readout
        ap, vown = split_heavy_rows(ap)
        self._m2 = ap.shape[0]
        self.n_virtual = self._m2 - m
        self._vown = (jnp.asarray(vown.astype(np.int32))
                      if vown is not None else None)
        if hybrid is None:
            hybrid = not on_cpu()
        w = None
        if hybrid:
            w = pack_pseg_hybrid(ap, th=th)
        if w is None:
            w = pack_pseg(ap, th=th)
        if w.fill < min_fill:
            raise ValueError(
                f"PSEG fill {w.fill:.2f} below {min_fill}; use the XLA path"
            )
        self.layout = w
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        self.bytes_per_iter = (w.bytes_per_iter   # per K-chunk pass
                               - w.val.size * (4 - value_dtype.itemsize))
        self.colperm = colperm
        self.rowperm = rowperm
        self._colperm = jnp.asarray(colperm.astype(np.int32))
        inv_row = np.empty(m, dtype=np.int64)
        inv_row[rowperm] = np.arange(m)
        self._rowperm_inv = jnp.asarray(inv_row.astype(np.int32))
        # hybrid stream: rounds [0, n_hub) are win2 hub tiles, the rest
        # panel-bound tail tiles (two branchless calls; see spmv_pseg)
        ns = w.th // SUBLANES
        if w.n_hub_rounds >= 0:
            self._tiles_h = max(w.n_hub_rounds // ns, 1)
        else:
            self._tiles_h = w.num_tiles
        self._tiles_t = w.num_tiles - self._tiles_h
        hr = self._tiles_h * w.th
        self._val = jnp.asarray(w.val[:hr]).astype(value_dtype)
        self._lcol = jnp.asarray(w.lcol[:hr])
        self._tsb = jnp.asarray(w.tsb[:hr])
        self._wr = jnp.asarray(w.round_wrow[: self._tiles_h * ns])
        self._ob = jnp.asarray(w.round_oblk[: self._tiles_h * ns])
        if self._tiles_t:
            self._val_t = jnp.asarray(w.val[hr:]).astype(value_dtype)
            self._lcol_t = jnp.asarray(w.lcol[hr:])
            self._tsb_t = jnp.asarray(w.tsb[hr:])
            self._wr_t = jnp.asarray(w.round_wrow[self._tiles_h * ns:])
            self._ob_t = jnp.asarray(w.round_oblk[self._tiles_h * ns:])
        self._srow = jnp.asarray(w.s_rows)
        self._scol = jnp.asarray(w.s_cols)
        self._sval = jnp.asarray(w.s_vals)
        self._calls = {}

    def _k_chunk(self) -> int:
        # Xt (kc, x2d_rows, 128) + Y (kc*y_rows, 128) share one VMEM: size
        # kc against their SUM, not separate limits (m=1M: kc=2 under the
        # separate limits put 8+8 MB in VMEM and crashed the compiler;
        # kc=1 means k passes over the schedule — gather-bound but correct)
        w = self.layout
        budget = 12 * (1 << 20)   # leaves room for double-buffered tiles
        per_k = (w.x2d_rows + w.y_rows) * LANES * 4
        return int(max(min(budget // per_k, 8), 1))

    def _get_call(self, kc: int, num_tiles: int, *, tail: bool):
        key = (kc, tail)
        if key in self._calls:
            return self._calls[key]
        w = self.layout
        from ...utils.backend import on_cpu

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Xt chunk whole
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(w.th, kc, w.y_rows, tail=tail),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((kc * w.y_rows, LANES),
                                           jnp.float32),
            interpret=on_cpu(),
        )
        self._calls[key] = call
        return call

    def device_arrays(self):
        d = {"wr": self._wr, "ob": self._ob, "val": self._val,
             "lcol": self._lcol, "tsb": self._tsb,
             "srow": self._srow, "scol": self._scol, "sval": self._sval,
             "colperm": self._colperm, "rowinv": self._rowperm_inv}
        if self._tiles_t:
            d.update({"wr_t": self._wr_t, "ob_t": self._ob_t,
                      "val_t": self._val_t, "lcol_t": self._lcol_t,
                      "tsb_t": self._tsb_t})
        if self.n_virtual:
            d["vown"] = self._vown
        return d

    def apply_permuted(self, arrs, x_perm):
        """Y_perm = A_perm @ X_perm, X/Y in hub-relabeled space."""
        m, n = self.shape
        w = self.layout
        k = x_perm.shape[1]
        kc = self._k_chunk()
        pad = w.x2d_rows * 128 - n
        cols = []
        for k0 in range(0, k, kc):
            kw = min(kc, k - k0)
            xs = x_perm[:, k0:k0 + kw].astype(jnp.float32)
            if kw < kc:
                xs = jnp.pad(xs, ((0, 0), (0, kc - kw)))
            xt = jnp.pad(xs, ((0, pad), (0, 0)))
            xt = xt.reshape(w.x2d_rows, 128, kc).transpose(2, 0, 1)
            y = self._get_call(kc, self._tiles_h, tail=False)(
                arrs["wr"], arrs["ob"], xt,
                arrs["val"], arrs["lcol"], arrs["tsb"])
            if self._tiles_t:
                y = y + self._get_call(kc, self._tiles_t, tail=True)(
                    arrs["wr_t"], arrs["ob_t"], xt,
                    arrs["val_t"], arrs["lcol_t"], arrs["tsb_t"])
            y = y.reshape(kc, w.y_rows * 128)[:kw]       # (kw, m2+pad)
            if w.n_stragglers:
                y = y.at[:, arrs["srow"]].add(
                    arrs["sval"][None, :]
                    * x_perm[arrs["scol"], k0:k0 + kw].T)
            yk = y[:, :m]
            if self.n_virtual:
                yk = yk.at[:, arrs["vown"]].add(y[:, m:self._m2])
            cols.append(yk.T)
        y_perm = jnp.concatenate(cols, axis=1)           # (m, k)
        return y_perm.astype(self.dtype)

    def apply_pure(self, arrs, x):
        x_perm = x[arrs["colperm"], :]
        y_perm = self.apply_permuted(arrs, x_perm)
        return y_perm[arrs["rowinv"], :]

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out
