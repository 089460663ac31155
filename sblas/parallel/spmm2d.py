"""2D-partitioned multi-chip SpMM over a ('rows', 'cols') mesh.

Same data flow as spmv2d (see that module's traffic analysis): chip (i, j)
owns block A[rows_i, cols_j]; the dense RHS X lives row-sharded over the
'cols' axis — chunk j is already on every chip of mesh column j — and the
single collective is a psum of the (m/R, k) partial Y over 'cols'. For K
RHS columns the 2D layout's advantage over the 1D all_gather grows K-fold:
1D must replicate the full (n, k) X per chip, 2D moves only ~2·(m/R)·k.

Local compute is the XLA ELL einsum per block. (The w-SELL SpMM Pallas
kernel needs X resident in VMEM as a (n_chunk, k) table; wiring it here
follows the same wsell_stack recipe as spmv2d and is worthwhile once the
ELL body shows up in profiles — the collective structure is identical.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..formats import CSR, INDEX_DTYPE
from ..partition import partition_rows
from ..retile import to_ell
from .mesh import make_mesh2d, rows_axis, cols_axis


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class Dist2DSpmmPlan:
    """Partition + retile + shard_map SpMM executor over a 2D mesh."""

    def __init__(self, a: CSR, mesh: Mesh | None = None):
        self.mesh = mesh or make_mesh2d()
        if self.mesh.axis_names != (rows_axis, cols_axis):
            raise ValueError(
                f"need a ('{rows_axis}', '{cols_axis}') mesh; got "
                f"{self.mesh.axis_names} (make_mesh2d builds one)"
            )
        R, C = self.mesh.devices.shape
        self.grid = (R, C)
        self.shape = a.shape
        self.dtype = a.dtype
        m, n = a.shape
        self.x_chunk = _round_up(max(-(-n // C), 1), 8)
        self.n_pad = self.x_chunk * C

        part = partition_rows(a, R, "nnz_balanced")
        row_starts = [int(r) for r in part.row_starts]

        from .wsell_stack import split_2d_blocks

        ells = [to_ell(b)
                for b in split_2d_blocks(part.parts, self.x_chunk, C)]
        width = max(max(e.width for e in ells), 1)
        rows_pad = max(_round_up(max(e.m, 1), 8) for e in ells)
        col = np.zeros((R, C, rows_pad, width), dtype=INDEX_DTYPE)
        val = np.zeros((R, C, rows_pad, width), dtype=a.dtype)
        for i in range(R):
            for j in range(C):
                e = ells[i * C + j]
                col[i, j, : e.col.shape[0], : e.width] = e.col
                val[i, j, : e.val.shape[0], : e.width] = e.val
        self.rows_pad = rows_pad
        sh = lambda spec: NamedSharding(self.mesh, spec)
        self._col = jax.device_put(col, sh(P(rows_axis, cols_axis)))
        self._val = jax.device_put(val, sh(P(rows_axis, cols_axis)))
        self.bytes_per_iter = col.size * (a.data.itemsize + 4)
        self.local_method = "ell"

        slot = np.empty(m, dtype=np.int64)
        for i in range(R):
            r0, r1 = row_starts[i], row_starts[i + 1]
            slot[r0:r1] = i * rows_pad + np.arange(r1 - r0)
        self._unpad = jnp.asarray(slot.astype(INDEX_DTYPE))
        self._x_sharding = sh(P(cols_axis, None))
        self._build_fn()

    def _build_fn(self):
        def body(col, val, x_shard):
            # col/val: (1, 1, rows_pad, W); x_shard: (x_chunk, k)
            with jax.named_scope("kernel"):
                y_loc = jnp.einsum("rw,rwk->rk", val[0, 0],
                                   x_shard[col[0, 0]])
            with jax.named_scope("collective"):
                y = lax.psum(y_loc, cols_axis)
            return y[None]

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(rows_axis, cols_axis), P(rows_axis, cols_axis),
                      P(cols_axis, None)),
            out_specs=P(rows_axis, None, None),
            check_vma=False,
        )
        unpad = self._unpad

        @jax.jit
        def run(col, val, x_pad):
            y = fn(col, val, x_pad)  # (R, rows_pad, k)
            return y.reshape(-1, y.shape[-1])[unpad]

        self._run = run

    def __call__(self, x, alpha: float = 1.0, beta: float = 0.0, y=None):
        m, n = self.shape
        x = jnp.asarray(x, dtype=self.dtype)
        if x.ndim != 2 or x.shape[0] != n:
            raise ValueError(f"X must have shape ({n}, k), got {x.shape}")
        x_pad = jnp.zeros((self.n_pad, x.shape[1]),
                          dtype=self.dtype).at[:n].set(x)
        x_pad = jax.device_put(x_pad, self._x_sharding)
        out = alpha * self._run(self._col, self._val, x_pad)
        if y is not None:
            out = out + beta * jnp.asarray(y, dtype=self.dtype)
        elif beta != 0.0:
            raise ValueError("beta != 0 requires y")
        return out


def dist_spmm2d(a: CSR, x, mesh: Mesh | None = None, **kw):
    """One-shot 2D-partitioned distributed SpMM."""
    return Dist2DSpmmPlan(a, mesh, **kw)(x)
