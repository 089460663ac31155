"""Multi-chip SpMM over the 1D 'chips' mesh (BASELINE config #5 weak scaling).

Same partition/collective structure as spmv_dist: X (n, k) is row-sharded,
all-gathered over ICI, each chip runs its local ELL x dense contraction, and
Y comes out row-sharded."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..formats import CSR
from ..partition import partition_rows
from .mesh import make_mesh, chips_axis
from .spmv_dist import _stack_ell, _round_up


class DistSpmmPlan:
    def __init__(self, a: CSR, mesh: Mesh | None = None, *,
                 strategy: str = "nnz_balanced", row_block: int = 2048):
        self.mesh = mesh or make_mesh()
        ndev = self.mesh.devices.size
        self.ndev = ndev
        self.shape = a.shape
        self.dtype = a.dtype
        self.row_block = row_block
        m, n = a.shape
        self.x_chunk = _round_up(max(-(-n // ndev), 1), 8)
        self.n_pad = self.x_chunk * ndev

        part = partition_rows(a, ndev, strategy)
        col, val, rows_pad, width = _stack_ell(part.parts, n, a.dtype)
        self.rows_pad = rows_pad
        slot = np.empty(m, dtype=np.int64)
        for d in range(ndev):
            r0, r1 = int(part.row_starts[d]), int(part.row_starts[d + 1])
            slot[r0:r1] = d * rows_pad + np.arange(r1 - r0)
        self._unpad = jnp.asarray(slot.astype(np.int32))
        sh = lambda spec: NamedSharding(self.mesh, spec)
        self._col = jax.device_put(col, sh(P(chips_axis)))
        self._val = jax.device_put(val, sh(P(chips_axis)))
        self._x_sharding = sh(P(chips_axis, None))
        self.bytes_per_iter_nx = col.size * (a.data.itemsize + 4)
        self._runs = {}

    def _get_run(self, k: int):
        if k in self._runs:
            return self._runs[k]
        m, n = self.shape
        rows_pad = self.rows_pad
        blk = min(_round_up(self.row_block, 8), rows_pad)
        while rows_pad % blk:
            blk -= 8
        nblk = rows_pad // blk
        unpad = self._unpad

        def body(col, val, x_shard):
            x_full = lax.all_gather(x_shard, chips_axis, tiled=True)

            def f(i):
                c = lax.dynamic_slice_in_dim(col[0], i * blk, blk)
                v = lax.dynamic_slice_in_dim(val[0], i * blk, blk)
                return jnp.einsum("rw,rwk->rk", v, x_full[c])

            y = lax.map(f, jnp.arange(nblk)).reshape(rows_pad, k)
            return y[None]

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(chips_axis), P(chips_axis), P(chips_axis, None)),
            out_specs=P(chips_axis, None, None),
            check_vma=False,
        )

        @jax.jit
        def run(col, val, x_pad):
            y = fn(col, val, x_pad)
            return y.reshape(-1, k)[unpad]

        self._runs[k] = run
        return run

    def __call__(self, x, alpha: float = 1.0, beta: float = 0.0, y=None):
        m, n = self.shape
        x = jnp.asarray(x, dtype=self.dtype)
        if x.ndim != 2 or x.shape[0] != n:
            raise ValueError(f"X must have shape ({n}, k)")
        k = x.shape[1]
        x_pad = jnp.zeros((self.n_pad, k), dtype=self.dtype).at[:n].set(x)
        x_pad = jax.device_put(x_pad, self._x_sharding)
        out = self._get_run(k)(self._col, self._val, x_pad)
        out = alpha * out
        if y is not None:
            out = out + beta * jnp.asarray(y, dtype=self.dtype)
        elif beta != 0.0:
            raise ValueError("beta != 0 requires y")
        return out


def dist_spmm(a: CSR, x, mesh: Mesh | None = None, **kw):
    alpha = kw.pop("alpha", 1.0)
    beta = kw.pop("beta", 0.0)
    y = kw.pop("y", None)
    return DistSpmmPlan(a, mesh, **kw)(x, alpha, beta, y)
