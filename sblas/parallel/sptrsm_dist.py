"""Multi-chip SpTRSM: K right-hand sides over the distributed wavefront.

Reuses DistSptrsvPlan wholesale — tile dealing, level batching, and the
shrunk per-batch exchange are all per-matrix products — and runs the K
solves inside ONE jitted computation (``lax.map`` over the shard_map
body): one dispatch, one compile, the schedule arrays resident across all
columns. A column-batched exchange (moving (chunk, k) slabs per batch
instead of k sequential (chunk,) gathers) would cut collective latency a
further ~k-fold and slots into the same plan later; the dominant win over
k separate dist solves — not re-dispatching and not re-shipping the
schedule — is had here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh

from ..formats import CSR
from .sptrsv_dist import DistSptrsvPlan


class DistSptrsmPlan:
    """K-RHS distributed triangular solve sharing DistSptrsvPlan's plan."""

    def __init__(self, l: CSR, mesh: Mesh | None = None, **kw):
        self._sv = DistSptrsvPlan(l, mesh, **kw)
        self.shape = self._sv.shape
        self.dtype = self._sv.dtype
        self.mesh = self._sv.mesh
        sv = self._sv
        fn = sv._fn

        @jax.jit
        def runk(slot_row, col, val, inv_diag, sr_all, b_pad_k):
            def solve1(bp):
                return fn(slot_row, col, val, inv_diag, sr_all, bp)[0]

            return lax.map(solve1, b_pad_k)

        self._runk = runk

    def __call__(self, b):
        n = self.shape[0]
        b = jnp.asarray(b, dtype=self.dtype)
        if b.ndim != 2 or b.shape[0] != n:
            raise ValueError(f"B must have shape ({n}, k), got {b.shape}")
        sv = self._sv
        # (k, 1, n+2): leading axis mapped, middle axis is the shard_map
        # replication axis the 1-RHS path uses
        b_pad_k = jnp.concatenate(
            [b.T, jnp.zeros((b.shape[1], 2), dtype=b.dtype)], axis=1
        )[:, None, :]
        xk = self._runk(sv._slot_row, sv._col, sv._val, sv._inv_diag,
                        sv._slot_row_all, b_pad_k)
        return xk.T


def dist_sptrsm(l: CSR, b, mesh: Mesh | None = None, **kw):
    return DistSptrsmPlan(l, mesh, **kw)(b)
