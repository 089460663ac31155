"""Pallas TPU SpMM kernel over the PSEG layout (scattered/power-law SpMM —
the SpMM half of BASELINE config #5's graph workloads).

Same rounds as spmv_pseg; per round the kernel loops over the K dense
columns (X staged in VMEM transposed as Xt[k, x2d_rows, 128]), gathering
each column's two-panel window and scattering the (8,128) partial into that
column's block of the stacked (k*y_rows, 128) VMEM output. K is chunked so
Xt + Y stay inside VMEM (k=32 streams the nnz in ceil(32/kc) passes — the
K-fold arithmetic intensity still leaves it far ahead of the XLA bucket).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_pseg import pack_pseg, SUBLANES, LANES
from .spmv_pseg import hub_relabel, _VMEM_X_LIMIT, _VMEM_Y_LIMIT


def _kernel(th, kc, y_rows):
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
                 reorder: bool = True, value_dtype=None):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        from .spmv_pallas import check_value_dtype

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        if reorder:
            ap, colperm, rowperm = hub_relabel(a)
        else:
            colperm = np.arange(n, dtype=np.int64)
            rowperm = np.arange(m, dtype=np.int64)
            ap = a
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
        self._val = jnp.asarray(w.val).astype(value_dtype)
        self._lcol = jnp.asarray(w.lcol)
        self._tsb = jnp.asarray(w.tsb)
        self._wr = jnp.asarray(w.round_wrow)
        self._ob = jnp.asarray(w.round_oblk)
        self._srow = jnp.asarray(w.s_rows)
        self._scol = jnp.asarray(w.s_cols)
        self._sval = jnp.asarray(w.s_vals)
        self._calls = {}

    def _k_chunk(self) -> int:
        w = self.layout
        by_y = max(_VMEM_Y_LIMIT // (w.y_rows * LANES * 4), 1)
        by_x = max(_VMEM_X_LIMIT // (w.x2d_rows * LANES * 4), 1)
        return int(min(by_y, by_x, 8))

    def _get_call(self, kc: int):
        if kc in self._calls:
            return self._calls[kc]
        w = self.layout
        from ...utils.backend import on_cpu

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(w.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Xt whole
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(w.th, kc, w.y_rows),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((kc * w.y_rows, LANES),
                                           jnp.float32),
            interpret=on_cpu(),
        )
        self._calls[kc] = call
        return call

    def device_arrays(self):
        return {"wr": self._wr, "ob": self._ob, "val": self._val,
                "lcol": self._lcol, "tsb": self._tsb,
                "srow": self._srow, "scol": self._scol, "sval": self._sval,
                "colperm": self._colperm, "rowinv": self._rowperm_inv}

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
            y = self._get_call(kc)(arrs["wr"], arrs["ob"], xt,
                                   arrs["val"], arrs["lcol"], arrs["tsb"])
            y = y.reshape(kc, w.y_rows * 128)[:kw, :m]   # (kw, m)
            cols.append(y.T)
        y_perm = jnp.concatenate(cols, axis=1)           # (m, k)
        if w.n_stragglers:
            y_perm = y_perm.at[arrs["srow"], :].add(
                arrs["sval"][:, None] * x_perm[arrs["scol"], :]
            )
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
