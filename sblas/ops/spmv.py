"""SpMV: y = alpha * A @ x + beta * y  (SURVEY.md C5).

Methods (selected by ``method=`` or ``'auto'``):

- ``'coo'``    — jnp ``segment_sum(vals * x[cols], rows)``. Reads 12 B/nnz
                 (val+col+row). Always available; the correctness anchor.
- ``'ell'``    — ELLPACK gather: ``sum(val * x[col], axis=1)``. Reads 8 B/nnz
                 of padded stream; best when fill is high (FEM suite).
- ``'bucket'`` — degree-bucketed ELLPACK with heavy-row splitting; bounded
                 padding on power-law matrices.
- ``'pallas'`` — Pallas windowed sliced-ELL kernel (sblas.ops.kernels).

The reference exposes csr-scalar / csr-vector / LightSpMV-style variants that
trade off row-length regularity; these methods are the TPU-native analogue of
that variant set (thread-per-row <-> ELL lanes, warp-per-row <-> bucketed
widths, dynamic scheduling <-> heavy-row splitting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSR
from ..retile import to_ell, to_bucket_ell
from ..retile_bsr import pack_bsr

import weakref

# plan cache shared by all op entry points, keyed weakly on the matrix
_PLAN_CACHE = weakref.WeakKeyDictionary()


def _axpby(y_new, alpha, beta, y, dtype):
    y_new = alpha * y_new
    if y is not None:
        y_new = y_new + beta * jnp.asarray(y, dtype=dtype)
    return y_new.astype(dtype)


@functools.partial(jax.jit, static_argnames=("m", "with_y"))
def _coo_exec(vals, cols, rows, x, alpha, beta, y, m, with_y):
    prods = vals * x[cols]
    out = jax.ops.segment_sum(prods, rows, num_segments=m)
    out = alpha.astype(out.dtype) * out
    if with_y:
        out = out + beta.astype(out.dtype) * y
    return out


@functools.partial(jax.jit, static_argnames=("m", "with_y"))
def _ell_exec(val, col, x, alpha, beta, y, m, with_y):
    out = jnp.sum(val * x[col], axis=1)[:m]
    out = alpha.astype(out.dtype) * out
    if with_y:
        out = out + beta.astype(out.dtype) * y
    return out


@functools.partial(jax.jit, static_argnames=("m", "with_y"))
def _bucket_exec(bucket_arrays, perm, x, alpha, beta, y, m, with_y):
    partials = [jnp.sum(val * x[col], axis=1) for (val, col) in bucket_arrays]
    flat = jnp.concatenate(partials)
    out = jnp.zeros(m + 1, dtype=flat.dtype).at[perm].add(flat)[:m]
    out = alpha.astype(out.dtype) * out
    if with_y:
        out = out + beta.astype(out.dtype) * y
    return out


class SpmvPlan:
    """Retiled device-resident SpMV executor for one CSR matrix."""

    def __init__(self, a, method: str = "auto", *, max_width: int = 2048,
                 value_dtype=None, min_fill=None, geometry=None):
        from .common import as_csr

        a = as_csr(a)
        fill_kw = {} if min_fill is None else {"min_fill": min_fill}
        # Per-matrix w-SELL geometry override (th/sub/wgroup/nwin), e.g. the
        # e35 consph pick. Applies to the w-SELL Pallas path only; other
        # routes ignore it (their packers own their geometry).
        self._geometry = dict(geometry) if geometry else {}
        self._value_dtype = value_dtype  # bf16 value stream (pallas paths)
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        auto = method == "auto"
        if auto:
            method = self._pick(a)
        if method == "pallas" and auto:
            # Fallback chain under auto (ADVICE r1): w-SELL Pallas ->
            # PSEG Pallas (scattered/power-law, hub-relabeled) -> XLA.
            try:
                from .kernels.spmv_pallas import PallasSpmv

                self._pallas = PallasSpmv(a, value_dtype=value_dtype,
                                          **fill_kw, **self._geometry)
                self.method = "pallas"
                self.fill = self._pallas.layout.fill
                self.bytes_per_iter = self._pallas.bytes_per_iter
                return
            except ValueError:
                method = "pseg"
        if method == "pseg":
            from .kernels.spmv_pseg import PallasSpmvScattered

            try:
                self._pallas = PallasSpmvScattered(
                    a, value_dtype=value_dtype, **fill_kw)
                self.method = "pseg"
                self.bytes_per_iter = self._pallas.bytes_per_iter
                self.fill = self._pallas.layout.fill
                return
            except ValueError:
                if not auto:
                    raise
                method = "pseg_big"
        if method == "pseg_big":
            # web-scale scattered matrices (uk-2002-class: 18.5M rows):
            # the whole-VMEM executor refuses x2d/y2d over the VMEM
            # ceilings; the y-grouped chunked-Xt executor (kres, kc=1)
            # has no per-matrix VMEM ceiling (spmv_pseg round 6)
            from .kernels.spmv_pseg import PallasSpmvScatteredBig

            try:
                self._pallas = PallasSpmvScatteredBig(
                    a, value_dtype=value_dtype, **fill_kw)
                self.method = "pseg"   # same permuted-space interface
                self.bytes_per_iter = self._pallas.bytes_per_iter
                self.fill = self._pallas.layout.fill
                return
            except ValueError:
                if not auto:
                    raise
                # RCM rescue targets mid-size band-local-but-scrambled
                # matrices; at web scale the host reorder (symmetrize +
                # permute of >1e8 nnz) costs tens of minutes and w-SELL
                # would still shatter on a graph, so go straight to XLA
                method = ("rcm" if a.shape[0] == a.shape[1]
                          and a.nnz <= 64_000_000
                          else self._xla_heuristic(a))
        if method == "rcm":
            # Band-local-but-scrambled matrices: neither w-SELL (window
            # locality destroyed) nor PSEG (no hub structure) packs them,
            # yet an RCM reordering restores FEM-class fill
            # (sblas.reorder). Run the w-SELL kernel on P A P^T; the
            # drop-in call pays two permutation gathers, apply_permuted
            # is the zero-overhead iterative path (pseg precedent).
            try:
                self._init_rcm(a, value_dtype, fill_kw)
                return
            except ValueError:
                if not auto:
                    raise
                method = self._xla_heuristic(a)
        self.method = method
        m, n = a.shape

        if method == "coo":
            self._vals = jnp.asarray(a.data)
            self._cols = jnp.asarray(a.indices)
            self._rows = jnp.asarray(a.row_ids())
            self.bytes_per_iter = a.nnz * (a.data.itemsize + 8)
        elif method == "ell":
            ell = to_ell(a)
            self._val = jnp.asarray(ell.val)
            self._col = jnp.asarray(ell.col)
            self.fill = ell.fill
            self.bytes_per_iter = ell.col.size * (a.data.itemsize + 4)
        elif method == "bucket":
            be = to_bucket_ell(a, max_width=max_width)
            self._buckets = tuple(
                (jnp.asarray(b.val), jnp.asarray(b.col)) for b in be.buckets
            )
            self._perm = jnp.asarray(be.perm)
            self.fill = be.fill
            self.bytes_per_iter = sum(
                b.col.size for b in be.buckets
            ) * (a.data.itemsize + 4)
        elif method == "bsr":
            bsr = pack_bsr(a)
            self._blocks = jnp.asarray(bsr.blocks)
            self._brow = jnp.asarray(bsr.brow)
            self._bcol = jnp.asarray(bsr.bcol)
            self._bsr_meta = bsr
            self.fill = bsr.density
            self.bytes_per_iter = bsr.bytes_per_iter + (n + m) * a.data.itemsize
        elif method == "pallas":
            from .kernels.spmv_pallas import PallasSpmv

            self._pallas = PallasSpmv(a, value_dtype=value_dtype,
                                      **fill_kw, **self._geometry)
            self.fill = self._pallas.layout.fill
            self.bytes_per_iter = self._pallas.bytes_per_iter
        elif method == "pallas_ds":
            # double-single f64-class fast path (opt-in: ~1e-14 error model
            # vs the XLA paths' true-f64 semantics; see spmv_wsell_ds)
            from .kernels.spmv_wsell_ds import PallasSpmvDS

            self._pallas = PallasSpmvDS(a, **fill_kw)
            self.fill = self._pallas.layout.fill
            self.bytes_per_iter = self._pallas.bytes_per_iter
        else:
            raise ValueError(f"unknown spmv method {method!r}")

    def _init_rcm(self, a: CSR, value_dtype, fill_kw):
        from .kernels.spmv_pallas import PallasSpmv
        from ..reorder import rcm

        ap, perm = rcm(a)
        self._pallas = PallasSpmv(ap, value_dtype=value_dtype, **fill_kw)
        self._rcm_perm = jnp.asarray(perm.astype(np.int32))
        inv = np.empty(len(perm), dtype=np.int64)
        inv[perm] = np.arange(len(perm))
        self._rcm_inv = jnp.asarray(inv.astype(np.int32))
        self.method = "rcm"
        self.fill = self._pallas.layout.fill
        self.bytes_per_iter = self._pallas.bytes_per_iter

    @staticmethod
    def _xla_heuristic(a: CSR) -> str:
        deg = a.row_lengths
        mx = int(deg.max(initial=0))
        mean = float(deg.mean()) if a.shape[0] else 0.0
        return "ell" if mx <= 4 * max(mean, 1.0) else "bucket"

    @staticmethod
    def _pick(a: CSR) -> str:
        from ..utils.backend import on_cpu

        if a.dtype == np.float64:
            # Pallas/Mosaic has no f64; XLA emulates it.
            return SpmvPlan._xla_heuristic(a)
        if not on_cpu():
            try:
                from .kernels import spmv_pallas  # noqa: F401

                return "pallas"
            except ImportError:
                pass
        return SpmvPlan._xla_heuristic(a)

    def __repr__(self):
        m, n = self.shape
        fill = getattr(self, "fill", None)
        fs = f", fill={fill:.2f}" if fill is not None else ""
        return (f"SpmvPlan({m}x{n}, nnz={self.nnz}, method={self.method!r}"
                f"{fs}, ~{self.bytes_per_iter / 1e6:.1f} MB/iter)")

    def device_arrays(self):
        """Pytree of this plan's device-resident arrays.

        IMPORTANT (axon/remote-compile): pass these as explicit jit arguments
        and use :meth:`apply_pure`; closing over device arrays embeds them as
        HLO constants, which ships hundreds of MB to the compiler.
        """
        if self.method == "coo":
            return {"vals": self._vals, "cols": self._cols, "rows": self._rows}
        if self.method == "ell":
            return {"val": self._val, "col": self._col}
        if self.method == "bucket":
            return {"buckets": self._buckets, "perm": self._perm}
        if self.method == "bsr":
            return {"blocks": self._blocks, "brow": self._brow,
                    "bcol": self._bcol}
        if self.method == "rcm":
            d = dict(self._pallas.device_arrays())
            d["rcm_perm"] = self._rcm_perm
            d["rcm_inv"] = self._rcm_inv
            return d
        return self._pallas.device_arrays()

    def apply_pure(self, arrs, x):
        """y = A @ x with arrays passed explicitly (jit-argument safe)."""
        m = self.shape[0]
        if self.method == "pallas_ds":
            raise ValueError(
                "pallas_ds carries x as two f32 planes; use "
                "plan._pallas.apply_pure(arrs, xh, xl) (split_x) or the "
                "numpy-f64 __call__")
        if self.method == "coo":
            return jax.ops.segment_sum(arrs["vals"] * x[arrs["cols"]],
                                       arrs["rows"], num_segments=m)
        if self.method == "ell":
            return jnp.sum(arrs["val"] * x[arrs["col"]], axis=1)[:m]
        if self.method == "bucket":
            partials = [jnp.sum(val * x[col], axis=1)
                        for (val, col) in arrs["buckets"]]
            flat = jnp.concatenate(partials)
            return jnp.zeros(m + 1, dtype=flat.dtype).at[arrs["perm"]].add(flat)[:m]
        if self.method == "bsr":
            meta = self._bsr_meta
            pad = meta.num_bcols * meta.bc - self.shape[1]
            x2d = jnp.pad(x, (0, pad)).reshape(meta.num_bcols, meta.bc)
            xg = x2d[arrs["bcol"]]
            partial = jnp.einsum("bij,bj->bi", arrs["blocks"], xg)
            y = jax.ops.segment_sum(partial, arrs["brow"],
                                    num_segments=meta.num_brows)
            return y.reshape(-1)[:m]
        if self.method == "rcm":
            # drop-in path: two XLA permutation gathers around the kernel
            # (slow on TPU — iterative users should stay in permuted space
            # via apply_permuted, as bench/pseg do)
            kern = {k: v for k, v in arrs.items()
                    if k not in ("rcm_perm", "rcm_inv")}
            y_perm = self._pallas.apply_pure(kern, x[arrs["rcm_perm"]])
            return y_perm[arrs["rcm_inv"]]
        return self._pallas.apply_pure(arrs, x)

    def apply_permuted(self, arrs, x_perm):
        """rcm/pseg fast path: operate in the plan's permuted space."""
        if self.method == "rcm":
            kern = {k: v for k, v in arrs.items()
                    if k not in ("rcm_perm", "rcm_inv")}
            return self._pallas.apply_pure(kern, x_perm)
        if self.method == "pseg":
            return self._pallas.apply_permuted(arrs, x_perm)
        raise ValueError(f"method {self.method!r} has no permuted space")

    def apply_traced(self, x):
        """Pure y = A @ x inside jit. Convenience wrapper over apply_pure
        (embeds arrays as constants — fine on CPU tests, avoid on axon)."""
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha: float = 1.0, beta: float = 0.0, y=None):
        m, n = self.shape
        if self.method == "pallas_ds":
            # numpy f64 boundary: jnp.asarray would silently downcast f64
            # to f32 under the default x64-off config (see spmv_wsell_ds)
            return self._pallas(x, alpha, beta, y, y is not None)
        x = jnp.asarray(x, dtype=self.dtype)
        if x.shape != (n,):
            raise ValueError(f"x must have shape ({n},), got {x.shape}")
        with_y = y is not None
        if beta != 0.0 and not with_y:
            raise ValueError("beta != 0 requires y")
        al = jnp.asarray(alpha, dtype=self.dtype)
        be = jnp.asarray(beta, dtype=self.dtype)
        yv = jnp.asarray(y, dtype=self.dtype) if with_y else None
        if self.method == "coo":
            return _coo_exec(self._vals, self._cols, self._rows, x, al, be, yv,
                             m, with_y)
        if self.method == "ell":
            return _ell_exec(self._val, self._col, x, al, be, yv, m, with_y)
        if self.method == "bucket":
            return _bucket_exec(self._buckets, self._perm, x, al, be, yv, m,
                                with_y)
        if self.method == "bsr":
            out = jax.jit(self.apply_traced)(x)
            out = al.astype(out.dtype) * out
            if with_y:
                out = out + be.astype(out.dtype) * yv
            return out
        if self.method == "rcm":
            if isinstance(x, jax.core.Tracer):
                # inside jit: device-side permutation gathers (correct
                # everywhere, slow on TPU — prefer apply_permuted there)
                out = self.apply_pure(self.device_arrays(), x)
            else:
                # eager: host-side permutes (XLA device gathers are ~1
                # GB/s on TPU)
                perm = np.asarray(self._rcm_perm)
                xp = jnp.asarray(np.asarray(x)[perm])
                y_perm = np.asarray(self._pallas.apply_traced(xp))
                out = jnp.asarray(y_perm[np.asarray(self._rcm_inv)])
            out = al.astype(out.dtype) * out
            if with_y:
                out = out + be.astype(out.dtype) * yv
            return out
        return self._pallas(x, al, be, yv, with_y)


def _get_plan(a: CSR, method: str, **kw) -> SpmvPlan:
    plans = _PLAN_CACHE.setdefault(a, {})
    key = ("spmv", method, tuple(sorted(kw.items())))
    if key not in plans:
        plans[key] = SpmvPlan(a, method, **kw)
    return plans[key]


def spmv(a, x, alpha: float = 1.0, beta: float = 0.0, y=None,
         *, trans: bool = False, method: str = "auto", **kw):
    """y_out = alpha * op(A) @ x + beta * y, op = A^T if trans else A.

    ``a`` may be CSR or CSC (the reference operates over both); plans are
    cached per derived matrix.
    """
    from .common import as_csr

    return _get_plan(as_csr(a, trans), method, **kw)(x, alpha, beta, y)
