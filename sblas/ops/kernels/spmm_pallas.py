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
from ...retile_wsell import pack_wsell, SUBLANES, LANES

_VMEM_XT_LIMIT = 24 * (1 << 20)
_VMEM_Y_LIMIT = 24 * (1 << 20)


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
                 value_dtype=None):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        from .spmv_pallas import check_value_dtype

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        w = pack_wsell(a, th=th, sub=sub, nwin=nwin, wgroup=wgroup)
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
        self._val = jnp.asarray(w.val).astype(value_dtype)
        self._lcol = jnp.asarray(w.lcol)
        self._wr = jnp.asarray(w.round_wrow)
        self._ob = jnp.asarray(w.round_obase)
        self._calls = {}

    def _get_call(self, k: int):
        if k in self._calls:
            return self._calls[k]
        w = self.layout
        n = self.shape[1]
        if k * w.x2d_rows * 128 * 4 > _VMEM_XT_LIMIT:
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
        if w.y_rows * w.sub * k * 4 > _VMEM_Y_LIMIT:
            raise ValueError("Y exceeds VMEM accumulator limit")
        from ...utils.backend import on_cpu
        interpret = on_cpu()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(w.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Xt whole
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(w.th, w.sub, w.nwin, w.wgroup, k),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((w.y_rows, k * w.sub), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * w.num_tiles * w.th * LANES * k),
                bytes_accessed=int(self.bytes_per_iter + n * k * 8),
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
        pad = w.x2d_rows * 128 - n
        xt = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
        xt = xt.reshape(w.x2d_rows, 128, k).transpose(2, 0, 1)  # (k, rows, 128)
        y = call(arrs["wr"], arrs["ob"], xt, arrs["val"], arrs["lcol"])
        # (y_rows, k*sub) -> y[row, kk]; row = blk*8*sub + s*sub + kseg
        y = y.reshape(w.y_rows, k, w.sub).transpose(0, 2, 1)
        return y.reshape(-1, k)[:m].astype(self.dtype)

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out
