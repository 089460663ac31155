"""SpTRSV: solve L x = b for triangular CSR L (SURVEY.md C7/C8).

Mirrors the reference's analysis/solve split: ``SptrsvPlan`` runs the host
level-set analysis once (native C++ sweep), then the solve executes as a
single jitted ``lax.fori_loop`` over level tiles — the TPU analogue of the
reference's one-kernel-launch-per-level wavefront, with the entire wavefront
loop living inside one XLA computation so per-level launch overhead is a loop
iteration, not a dispatch (SURVEY.md §3.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..formats import CSR
from ..sptrsv_schedule import build_level_schedule, validate_schedule
from .spmv import _PLAN_CACHE


@functools.partial(jax.jit, static_argnames=("n", "tile_rows", "num_tiles"))
def _solve_tiles(slot_row, col, val, inv_diag, b_pad, n, tile_rows, num_tiles):
    """Serial scan over tiles; each tile solves tile_rows independent rows.

    x buffer layout: [0:n] solution, [n] constant zero (gather target of
    padded columns), [n+1] dump slot (scatter target of padded rows).
    """
    width = col.shape[1]

    def body(t, x):
        s0 = t * tile_rows
        rows = lax.dynamic_slice_in_dim(slot_row, s0, tile_rows)
        c = lax.dynamic_slice_in_dim(col, s0, tile_rows)
        v = lax.dynamic_slice_in_dim(val, s0, tile_rows)
        idg = lax.dynamic_slice_in_dim(inv_diag, s0, tile_rows)
        acc = jnp.sum(v * x[c], axis=1)
        xb = (b_pad[rows] - acc) * idg
        # pad rows carry slot_row == n -> redirect their write to dump n+1
        safe_rows = jnp.where(rows == n, n + 1, rows)
        return x.at[safe_rows].set(xb)

    x0 = jnp.zeros(n + 2, dtype=val.dtype)
    x = lax.fori_loop(0, num_tiles, body, x0)
    return x[:n]


class SptrsvPlan:
    """Analysis-phase product for one triangular matrix (reference: the
    per-matrix level-set analysis kernel, SURVEY.md C7)."""

    def __init__(self, l, *, lower: bool = True,
                 unit_diagonal: bool = False, tile_rows: int = 0,
                 method: str = "auto", validate: bool = False):
        from .common import as_csr

        l = as_csr(l)
        self.shape = l.shape
        self.dtype = l.dtype
        self.lower = lower
        self.unit_diagonal = unit_diagonal
        if method == "auto":
            method = "tiles"
            from ..utils.backend import on_cpu

            if l.dtype != np.float64 and not on_cpu():
                # XLA gather is ~1 GB/s serial on TPU (measured); the Pallas
                # wavefront kernel is the only fast path there.
                method = "pallas"
        if method == "pallas_ds":
            # f64-class fast path (opt-in): f32 wavefront + double-single
            # residual refinement in slot space (kernels/sptrsv_ds)
            from .kernels.sptrsv_ds import PallasSptrsvDS

            self._pallas = PallasSptrsvDS(l, lower=lower,
                                          unit_diagonal=unit_diagonal, **{})
            self.method = "pallas_ds"
            self.bytes_per_iter = self._pallas.bytes_per_iter
            self.nlevels = self._pallas.nlevels
            self.tile_rows = 128
            self.num_tiles = self._pallas.layout.num_tiles
            self.padding_ratio = (self._pallas.layout.num_blocks * 128
                                  / max(l.shape[0], 1))
            return
        if method == "pallas":
            from .kernels.sptrsv_pallas import PallasSptrsv

            try:
                self._pallas = PallasSptrsv(l, lower=lower,
                                            unit_diagonal=unit_diagonal)
            except ValueError:
                # level structure too deep for the VMEM wavefront; fall back
                method = "tiles"
        self.method = method
        if method == "pallas":
            self.bytes_per_iter = self._pallas.bytes_per_iter
            self.nlevels = self._pallas.nlevels
            self.tile_rows = 128
            self.num_tiles = self._pallas.layout.num_tiles
            self.padding_ratio = (self._pallas.layout.num_blocks * 128
                                  / max(l.shape[0], 1))
            return
        sched = build_level_schedule(
            l, lower=lower, unit_diagonal=unit_diagonal, tile_rows=tile_rows
        )
        if validate:
            validate_schedule(sched)
        self.nlevels = sched.nlevels
        self.tile_rows = sched.tile_rows
        self.num_tiles = sched.num_tiles
        self.padding_ratio = sched.padded_slots / max(l.shape[0], 1)
        self._sched = sched
        self._slot_row = jnp.asarray(sched.slot_row)
        self._col = jnp.asarray(sched.col)
        self._val = jnp.asarray(sched.val)
        self._inv_diag = jnp.asarray(sched.inv_diag)
        # bytes touched per solve: schedule stream + x/b traffic
        self.bytes_per_iter = (
            sched.col.size * (4 + l.data.itemsize)
            + sched.padded_slots * (4 + l.data.itemsize)
            + l.shape[0] * 2 * l.data.itemsize
        )

    def device_arrays(self):
        if self.method == "pallas":
            return self._pallas.device_arrays()
        return {"slot_row": self._slot_row, "col": self._col,
                "val": self._val, "inv_diag": self._inv_diag}

    def apply_pure(self, arrs, b):
        """x = solve(L, b) with arrays passed explicitly (jit-argument safe)."""
        if self.method == "pallas_ds":
            raise ValueError(
                "pallas_ds carries b as two f32 planes; use "
                "plan._pallas.solve_planes(arrs, bh, bl) or the numpy-f64 "
                "__call__")
        if self.method == "pallas":
            return self._pallas.apply_pure(arrs, b)
        n = self.shape[0]
        b_pad = jnp.concatenate([b, jnp.zeros(2, dtype=b.dtype)])
        tile_rows, num_tiles = self.tile_rows, self.num_tiles
        slot_row, col, val, inv_diag = (arrs["slot_row"], arrs["col"],
                                        arrs["val"], arrs["inv_diag"])

        def body(t, x):
            s0 = t * tile_rows
            rows = lax.dynamic_slice_in_dim(slot_row, s0, tile_rows)
            c = lax.dynamic_slice_in_dim(col, s0, tile_rows)
            v = lax.dynamic_slice_in_dim(val, s0, tile_rows)
            idg = lax.dynamic_slice_in_dim(inv_diag, s0, tile_rows)
            acc = jnp.sum(v * x[c], axis=1)
            xb = (b_pad[rows] - acc) * idg
            safe_rows = jnp.where(rows == n, n + 1, rows)
            return x.at[safe_rows].set(xb)

        x0 = jnp.zeros(n + 2, dtype=val.dtype)
        return lax.fori_loop(0, num_tiles, body, x0)[:n]

    def apply_traced(self, b):
        return self.apply_pure(self.device_arrays(), b)

    def __call__(self, b):
        n = self.shape[0]
        if self.method == "pallas_ds":
            # numpy f64 boundary (jnp.asarray would downcast under x64-off)
            b = np.asarray(b, dtype=np.float64)
            if b.shape != (n,):
                raise ValueError(f"b must have shape ({n},), got {b.shape}")
            return self._pallas(b)
        b = jnp.asarray(b, dtype=self.dtype)
        if b.shape != (n,):
            raise ValueError(f"b must have shape ({n},), got {b.shape}")
        if self.method == "pallas":
            # host-side permutes (XLA device gathers are slow on TPU)
            p = self._pallas
            b2d = jnp.asarray(p.b_to_b2d(np.asarray(b)))
            x2d = p.solve_permuted(p.device_arrays(), b2d)
            return jnp.asarray(p.x2d_to_x(np.asarray(x2d)))
        b_pad = jnp.concatenate([b, jnp.zeros(2, dtype=b.dtype)])
        return _solve_tiles(
            self._slot_row, self._col, self._val, self._inv_diag, b_pad,
            n, self.tile_rows, self.num_tiles,
        )


def sptrsv(l, b, *, lower: bool = True, unit_diagonal: bool = False,
           trans: bool = False, method: str = "auto", **kw):
    """Solve op(L) x = b, op = L^T if trans else L.

    ``lower`` describes the *stored* matrix ``l`` (CSR or CSC); with
    ``trans=True`` the solved operator's triangularity flips (the classic
    Cholesky backsolve L^T x = b given lower L). The level-set analysis is
    cached per derived matrix.
    """
    from .common import as_csr

    l = as_csr(l, trans)
    if trans:
        lower = not lower
    plans = _PLAN_CACHE.setdefault(l, {})
    key = ("sptrsv", lower, unit_diagonal, method, tuple(sorted(kw.items())))
    if key not in plans:
        if method == "jacobi":
            # truncated-Neumann sweep solve (bandwidth-bound; exact at
            # nlevels-1 sweeps) — see ops/sptrsv_iter.py
            from .sptrsv_iter import SptrsvJacobiPlan

            plans[key] = SptrsvJacobiPlan(
                l, lower=lower, unit_diagonal=unit_diagonal, **kw)
        else:
            plans[key] = SptrsvPlan(l, lower=lower,
                                    unit_diagonal=unit_diagonal,
                                    method=method, **kw)
    return plans[key](b)
