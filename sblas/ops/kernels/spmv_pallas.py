"""Pallas TPU SpMV kernel over the w-SELL layout (SURVEY.md C5 fast path).

Per grid step (one (8 x 128) tile feeding 8*sub rows):
  1. stream val/lcol tile HBM->VMEM (Pallas pipelines/double-buffers),
  2. for each of pmax panels: broadcast one 128-wide row of the VMEM-resident
     x2d to 8 sublanes and `take_along_axis(..., axis=1)` — the per-sublane
     lane-gather, the only gather form Mosaic v5e supports — masked by panel,
  3. multiply-accumulate, reduce each row segment's lanes, accumulate into
     the group's (8, sub) output block (revisited across the group's
     consecutive tiles).

The gather rides entirely in registers/VMEM; HBM traffic is the val/lcol
stream (8 B per slot) plus one pass over x and y, so the kernel is
bandwidth-bound by design. f64 is not supported by Mosaic — callers keep f64
on the XLA path (BASELINE.md note on fp64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_wsell import pack_wsell, SUBLANES, LANES

_VMEM_X_LIMIT = 24 * (1 << 20)  # stage x fully in VMEM up to this size


def _kernel(pmax, sub):
    lps = LANES // sub

    def kern(tg_ref, wr_ref, tf_ref, x2d_ref, val_ref, col_ref, out_ref):
        t = pl.program_id(0)
        w = wr_ref[t]
        v = val_ref[:].astype(jnp.float32)
        lc = col_ref[:]
        acc = jnp.zeros((SUBLANES, LANES), dtype=jnp.float32)
        for p in range(pmax):
            xw = x2d_ref[pl.ds(w + p, 1), :]            # (1, 128)
            table = jnp.broadcast_to(xw, (SUBLANES, 128))
            idx = lc - p * 128
            inwin = (idx >= 0) & (idx < 128)
            g = jnp.take_along_axis(table, jnp.clip(idx, 0, 127), axis=1)
            acc = acc + jnp.where(inwin, v * g, 0.0)
        # Segmented lane reduction via a constant 0/1 matrix on the MXU:
        # Mosaic cannot shape-cast (8,128)->(8,sub,lps), but (8,128)@(128,sub)
        # is a native matmul. seg[j,k] = 1 iff lane j belongs to segment k.
        seg = (jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 0) // lps
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, sub), 1)
               ).astype(jnp.float32)
        # HIGHEST precision: v5e MXU multiplies in bf16 by default, which
        # rounds acc's mantissa (measured rel-err ~1e-3); the 3-pass f32
        # emulation restores f32 accuracy and is still cheap at (8,128,sub).
        partial = jnp.dot(acc, seg, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

        @pl.when(tf_ref[t] == 1)
        def _():
            out_ref[:] = partial

        @pl.when(tf_ref[t] == 0)
        def _():
            out_ref[:] = out_ref[:] + partial

    return kern


class PallasSpmv:
    """w-SELL Pallas SpMV executor for one CSR matrix."""

    def __init__(self, a: CSR, *, sub: int = 0, pmax: int = 4,
                 min_fill: float = 0.25):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        m, n = a.shape
        x_bytes = (-(-n // 128) + pmax) * 128 * 4
        if x_bytes > _VMEM_X_LIMIT:
            raise ValueError(
                f"x ({x_bytes >> 20} MB) exceeds VMEM staging limit; "
                "use the XLA path or the multi-chip partitioner"
            )
        w = pack_wsell(a, sub=sub, pmax=pmax)
        if w.fill < min_fill:
            raise ValueError(
                f"w-SELL fill {w.fill:.2f} below {min_fill} (scattered "
                "columns); use the XLA bucket path"
            )
        self.layout = w
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        self.bytes_per_iter = (
            w.bytes_per_iter + n * 4 + m * 4 + w.num_tiles * 12
        )
        self._val = jnp.asarray(w.val)
        self._lcol = jnp.asarray(w.lcol)
        self._tg = jnp.asarray(w.tile_group)
        self._wr = jnp.asarray(w.tile_wrow)
        self._tf = jnp.asarray(w.tile_first)
        self._call = self._build()

    def _build(self):
        w = self.layout
        T = w.num_tiles
        interpret = jax.default_backend() == "cpu"

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d, whole array
                pl.BlockSpec((SUBLANES, LANES), lambda t, tg, wr, tf: (t, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda t, tg, wr, tf: (t, 0)),
            ],
            out_specs=pl.BlockSpec(
                (SUBLANES, w.sub), lambda t, tg, wr, tf: (tg[t], 0)
            ),
        )

        return pl.pallas_call(
            _kernel(w.pmax, w.sub),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (w.num_groups * SUBLANES, w.sub), jnp.float32
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * T * SUBLANES * LANES * w.pmax),
                bytes_accessed=int(self.bytes_per_iter),
                transcendentals=0,
            ),
        )

    def device_arrays(self):
        return {"tg": self._tg, "wr": self._wr, "tf": self._tf,
                "val": self._val, "lcol": self._lcol}

    def apply_pure(self, arrs, x):
        m, n = self.shape
        w = self.layout
        pad = w.x2d_rows * 128 - n
        x2d = jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(-1, 128)
        y = self._call(arrs["tg"], arrs["wr"], arrs["tf"], x2d, arrs["val"],
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
