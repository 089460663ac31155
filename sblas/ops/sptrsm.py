"""SpTRSM: solve op(L) X = B for K right-hand sides (B is (n, k)).

The reference family ships a multi-RHS triangular solve alongside SpTRSV
(cuSPARSE: csrsm2); here it reuses SpTRSV's analysis products wholesale —
the level schedule, the Pallas wavefront layout, and the dense-tail block
inverses are all per-matrix, not per-RHS, so a ``SptrsmPlan`` pays one
analysis for any number of columns.

Methods:

- ``'tiles'`` — the XLA level-tile ``fori_loop`` generalized to a (n, k)
  solution buffer: each tile gathers its dependency rows once and applies
  them to all K columns (``einsum('rw,rwk->rk')``), so the index stream
  amortizes K-fold vs K SpTRSV calls.
- ``'pallas'`` — the single-call VMEM wavefront kernel, mapped over
  columns with ``lax.map`` inside one jitted computation: one dispatch,
  one compile, K sequential on-chip solves sharing the schedule stream
  already resident in HBM/VMEM. (A lane-native K-RHS kernel is possible
  but the schedule re-stream is ~the same bytes either way; the dominant
  win — not paying K dispatches or K permutation round-trips — is had
  here.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .spmv import _PLAN_CACHE
from .sptrsv import SptrsvPlan

SUBLANES = 8
SUB = 16


@functools.partial(jax.jit, static_argnames=("n", "tile_rows", "num_tiles"))
def _solve_tiles_multi(slot_row, col, val, inv_diag, b_pad, n, tile_rows,
                       num_tiles):
    """Serial scan over level tiles; K columns solved together.

    Buffer layout matches sptrsv._solve_tiles: rows [0:n] solution, [n]
    constant zero (gather target of padded columns), [n+1] dump slot
    (scatter target of padded rows) — now each a K-vector.
    """
    k = b_pad.shape[1]

    def body(t, x):
        s0 = t * tile_rows
        rows = lax.dynamic_slice_in_dim(slot_row, s0, tile_rows)
        c = lax.dynamic_slice_in_dim(col, s0, tile_rows)
        v = lax.dynamic_slice_in_dim(val, s0, tile_rows)
        idg = lax.dynamic_slice_in_dim(inv_diag, s0, tile_rows)
        acc = jnp.einsum("rw,rwk->rk", v, x[c])
        xb = (b_pad[rows] - acc) * idg[:, None]
        safe_rows = jnp.where(rows == n, n + 1, rows)
        return x.at[safe_rows].set(xb)

    x0 = jnp.zeros((n + 2, k), dtype=val.dtype)
    x = lax.fori_loop(0, num_tiles, body, x0)
    return x[:n]


class SptrsmPlan:
    """Multi-RHS triangular-solve executor sharing SpTRSV's analysis."""

    # lanes kernel pays a fixed multi-RHS round-count regardless of k<=8;
    # below this k the old per-RHS chunked path is cheaper
    LANES_MIN_K = 3

    def __init__(self, l, *, lower: bool = True, unit_diagonal: bool = False,
                 tile_rows: int = 0, method: str = "auto",
                 validate: bool = False):
        from .common import as_csr

        self._l_csr = as_csr(l)
        self._sv = SptrsvPlan(l, lower=lower, unit_diagonal=unit_diagonal,
                              tile_rows=tile_rows, method=method,
                              validate=validate)
        self.shape = self._sv.shape
        self.dtype = self._sv.dtype
        self.lower = lower
        self.unit_diagonal = unit_diagonal
        self.method = self._sv.method
        self.nlevels = self._sv.nlevels
        self.padding_ratio = self._sv.padding_ratio
        if self.method == "pallas":
            p = self._sv._pallas
            # Jitted ONCE per plan, with the schedule arrays as call
            # arguments: wrapping a fresh ``functools.partial(f, arrs)`` in
            # ``jax.jit`` per solve both re-traces every call AND embeds the
            # MB-scale schedule stream as HLO constants shipped to the axon
            # remote compiler (DESIGN.md) — measured 35 s/solve before this.
            self._solve_chunk = jax.jit(p.solve_permuted_multi)
            self._solve_chunks = jax.jit(
                lambda arrs, bks: lax.map(
                    lambda bk: p.solve_permuted_multi(arrs, bk), bks))
            self._kc = None  # chunk width settled by the first solve
            self._lanes = None
            self._lanes_state = "untried"

    def _get_lanes(self):
        """RHS-on-sublanes multi-RHS kernel (VERDICT r1 item 5): one
        gather/dot serves all 8 RHS per round instead of per-RHS chains
        that serialize in issue slots (measured k=8 = 7.7-8.1x one
        SpTRSV). Built lazily; any failure pins the chunked fallback."""
        if self._lanes_state == "untried":
            self._lanes_state = "failed"
            try:
                from .kernels.sptrsv_pallas import PallasSptrsvLanes

                p = PallasSptrsvLanes(self._l_csr, lower=self.lower,
                                      unit_diagonal=self.unit_diagonal)
                self._solve_lanes = jax.jit(p.solve_permuted)
                self._lanes = p
                self._lanes_state = "ok"
            except ValueError:
                pass
        return self._lanes if self._lanes_state == "ok" else None

    def _lanes_call(self, b):
        p = self._lanes
        k = b.shape[1]
        b_np = np.asarray(b, dtype=np.float32)
        arrs = p.device_arrays()
        outs = []
        for c0 in range(0, k, p.MAX_RHS):
            bc = b_np[:, c0:c0 + p.MAX_RHS]
            b3d = p.b_to_b3d(bc)
            x2d = np.asarray(self._solve_lanes(arrs, jnp.asarray(b3d)))
            outs.append(p.x2d_to_x(x2d, bc.shape[1]))
        return jnp.asarray(np.concatenate(outs, axis=1).astype(self.dtype))

    def bytes_per_iter(self, k: int) -> int:
        """Traffic model for one K-column solve."""
        sv = self._sv.bytes_per_iter
        rhs = self.shape[0] * 2 * np.dtype(self.dtype).itemsize
        if (self.method == "pallas" and self._lanes_state == "ok"
                and k >= self.LANES_MIN_K):
            lv = self._lanes
            nchunk = -(-k // lv.MAX_RHS)
            return lv.bytes_per_iter * nchunk + rhs * k
        if self.method == "pallas":
            # schedule re-streamed once per chunk (width settled by the
            # first solve's VMEM degrade; MAX_RHS until then); b/x traffic
            # scales with k
            kc = self._kc or self._sv._pallas.MAX_RHS
            nchunk = -(-k // kc)
            return sv * nchunk + rhs * (k - nchunk)
        # tiles: index/value stream read once, b/x traffic scales with k
        return sv + rhs * (k - 1)

    def device_arrays(self):
        return self._sv.device_arrays()

    def apply_pure(self, arrs, b):
        """X = op(L)^{-1} B with arrays passed explicitly (jit-safe). b is
        (n, k)."""
        n = self.shape[0]
        if self.method == "pallas":
            p = self._sv._pallas
            solve1 = functools.partial(p.apply_pure, arrs)
            return lax.map(solve1, b.T).T
        b_pad = jnp.concatenate(
            [b, jnp.zeros((2, b.shape[1]), dtype=b.dtype)]
        )
        tile_rows, num_tiles = self._sv.tile_rows, self._sv.num_tiles
        k = b.shape[1]

        def body(t, x):
            s0 = t * tile_rows
            rows = lax.dynamic_slice_in_dim(arrs["slot_row"], s0, tile_rows)
            c = lax.dynamic_slice_in_dim(arrs["col"], s0, tile_rows)
            v = lax.dynamic_slice_in_dim(arrs["val"], s0, tile_rows)
            idg = lax.dynamic_slice_in_dim(arrs["inv_diag"], s0, tile_rows)
            acc = jnp.einsum("rw,rwk->rk", v, x[c])
            xb = (b_pad[rows] - acc) * idg[:, None]
            safe_rows = jnp.where(rows == n, n + 1, rows)
            return x.at[safe_rows].set(xb)

        x0 = jnp.zeros((n + 2, k), dtype=arrs["val"].dtype)
        return lax.fori_loop(0, num_tiles, body, x0)[:n]

    def apply_traced(self, b):
        return self.apply_pure(self.device_arrays(), b)

    def _pallas_call(self, b):
        """Permuted-space batched solve: host permute of all K columns at
        once, then lane-parallel wavefronts in chunks of MAX_RHS columns.

        Each chunk is ONE pallas_call solving its columns simultaneously —
        per-RHS x2d/acc refs let Mosaic overlap the per-column gather/dot
        chains, which sit off the shared block-dependency critical path
        (the solve is latency-bound: 39 GB/s measured round 3, where
        lax.map over single-RHS solves cost exactly K x the SpTRSV time)."""
        k = b.shape[1]
        if k >= self.LANES_MIN_K and self._get_lanes() is not None:
            try:
                return self._lanes_call(b)
            except Exception:  # noqa: BLE001 — compile OOM etc.: pin fallback
                self._lanes_state = "failed"
        p = self._sv._pallas
        lay = p.layout
        b_np = np.asarray(b, dtype=np.float32)
        b_pad = np.zeros((lay.num_blocks * 128, k), dtype=np.float32)
        b_pad[np.asarray(lay.slot_of_row)] = b_np
        # (k, num_blocks*8, 16), pre-scaled by 1/diag
        b2d_full = (b_pad.T.reshape(k, lay.num_blocks * SUBLANES, SUB)
                    * np.asarray(lay.inv_diag)[None])
        arrs = p.device_arrays()

        # Chunk width degrades 8 -> 4 -> 2 -> 1 on the FIRST solve only
        # (settled width memoized in self._kc): the host-side VMEM guard
        # catches most oversized cases up front (ValueError), and the Mosaic
        # scoped-VMEM stack estimate is approximate, so a compile-time OOM
        # from the remote compiler (RuntimeError family) also degrades.
        widths = ((self._kc,) if self._kc else (p.MAX_RHS, 4, 2, 1))
        for kc in widths:
            try:
                b2d_k = b2d_full
                pad_k = (-k) % kc if k > kc else 0
                if pad_k:
                    b2d_k = np.concatenate(
                        [b2d_k,
                         np.zeros((pad_k,) + b2d_k.shape[1:], np.float32)])
                if b2d_k.shape[0] <= kc:
                    x2d_k = self._solve_chunk(arrs, jnp.asarray(b2d_k))
                else:
                    chunks = b2d_k.reshape(-1, kc, *b2d_k.shape[1:])
                    # (nc, kc, rows, 128)
                    out = self._solve_chunks(arrs, jnp.asarray(chunks))
                    x2d_k = out.reshape(-1, out.shape[2], out.shape[3])
                x2d_k = np.asarray(x2d_k)
                self._kc = kc
                break
            except Exception:  # noqa: BLE001 — degrade on VMEM OOM
                if kc == 1:
                    raise
                continue
        flat = x2d_k[:k, : lay.num_blocks].reshape(k, -1)
        return jnp.asarray(
            flat[:, np.asarray(lay.slot_of_row)].T.astype(self.dtype)
        )

    def __call__(self, b):
        n = self.shape[0]
        b = jnp.asarray(b, dtype=self.dtype)
        if b.ndim != 2 or b.shape[0] != n:
            raise ValueError(f"B must have shape ({n}, k), got {b.shape}")
        if self.method == "pallas":
            return self._pallas_call(b)
        sv = self._sv
        b_pad = jnp.concatenate(
            [b, jnp.zeros((2, b.shape[1]), dtype=b.dtype)]
        )
        return _solve_tiles_multi(
            sv._slot_row, sv._col, sv._val, sv._inv_diag, b_pad,
            n, sv.tile_rows, sv.num_tiles,
        )


def sptrsm(l, b, *, lower: bool = True, unit_diagonal: bool = False,
           trans: bool = False, method: str = "auto", **kw):
    """Solve op(L) X = B for (n, k) B, op = L^T if trans else L.

    ``l`` may be CSR or CSC; analysis is cached per derived matrix and
    shared across RHS widths.
    """
    from .common import as_csr

    l = as_csr(l, trans)
    if trans:
        lower = not lower
    plans = _PLAN_CACHE.setdefault(l, {})
    key = ("sptrsm", lower, unit_diagonal, method, tuple(sorted(kw.items())))
    if key not in plans:
        if method == "jacobi":
            # truncated-Neumann sweep solve: one SpMM per sweep serves
            # all k RHS — see ops/sptrsv_iter.py
            from .sptrsv_iter import SptrsmJacobiPlan

            plans[key] = SptrsmJacobiPlan(
                l, lower=lower, unit_diagonal=unit_diagonal, **kw)
        elif method == "pallas_ds":
            # f64-class (opt-in): lanes wavefront + slot-space ds
            # refinement, 8 RHS per solve pass (VERDICT r3 item 5)
            from .kernels.sptrsv_ds import PallasSptrsmDS

            plans[key] = PallasSptrsmDS(
                l, lower=lower, unit_diagonal=unit_diagonal, **kw)
        else:
            plans[key] = SptrsmPlan(l, lower=lower,
                                    unit_diagonal=unit_diagonal,
                                    method=method, **kw)
    return plans[key](b)
