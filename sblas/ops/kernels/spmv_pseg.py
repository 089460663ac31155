"""Pallas TPU SpMV kernel over the PSEG layout (scattered/power-law fast
path — SURVEY.md §7 hard-part 4, VERDICT r1 item 6).

Per (8 x 128) round (see retile_pseg for the layout):

  1. two-panel window gather of x from VMEM (identical to spmv_pallas),
  2. p = val * g,
  3. scatter-by-sublane: out_block[ts, l] = sum_s p[s, l] * [tsb[s,l] == ts]
     — 8 masked sublane-reductions on the VPU (~25 ops/slot, far below the
     HBM bound), accumulated into the round's (8,128) y2d block.

The executor wraps the kernel with HUB RELABELING: power-law matrices get
their columns permuted by descending popularity (hot hub columns land in
panel 0/1 so nearly all nnz satisfy the 2-panel window) and rows by
descending degree (blocks hold similar-degree rows, balancing the per-lane
8-slot round capacity). The kernel then runs in permuted space;
``apply_permuted`` is the zero-overhead path for iterative use and the
benchmark (precedent: PallasSptrsv.solve_permuted), while ``apply_pure``
adds the two device-side permutation gathers for drop-in correctness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_pseg import pack_pseg, HUB_PANELS, SUBLANES, LANES

_VMEM_X_LIMIT = 24 * (1 << 20)
_VMEM_Y_LIMIT = 8 * (1 << 20)


def _kernel(th, tail: bool = False, zero_out: bool = True):
    """PSEG SpMV kernel body (branchless — a per-round pl.when hub/tail
    branch measured ~95 ns/round of predication overhead, 4x a round).

    ``tail=False``: win2 hub rounds — the round's columns live in panels
    {w, w+1}, gathered from two broadcast tables.
    ``tail=True``: panel-bound TAIL_WIN rounds (pack_pseg_hybrid) — slot
    sublane s reads panel w+s (lcol < 128) or w+8+s: two direct (8,128)
    x2d slices, no broadcasts, an 8x wider window at no extra cost.
    ``zero_out=False`` accumulates onto the incoming out buffer (the tail
    call runs after the hub call on the same y)."""
    ns = th // SUBLANES

    def kern(wrow_ref, oblk_ref, x2d_ref, val_ref, col_ref, tsb_ref, out_ref):
        t = pl.program_id(0)

        if zero_out:
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
            if tail:
                x8a = x2d_ref[pl.ds(w, SUBLANES), :]           # panels w+s
                x8b = x2d_ref[pl.ds(w + SUBLANES, SUBLANES), :]
                g0 = jnp.take_along_axis(x8a, c0, axis=1)
                g1 = jnp.take_along_axis(x8b, c1, axis=1)
            else:
                xw = x2d_ref[pl.ds(w, 1), :]
                table = jnp.broadcast_to(xw, (SUBLANES, 128))
                xw1 = x2d_ref[pl.ds(w + 1, 1), :]
                table1 = jnp.broadcast_to(xw1, (SUBLANES, 128))
                g0 = jnp.take_along_axis(table, c0, axis=1)
                g1 = jnp.take_along_axis(table1, c1, axis=1)
            g = jnp.where(c < 128, g0, g1)
            p = v * g                                      # (8, 128)
            parts = [
                jnp.sum(p * (tsb == ts).astype(jnp.float32), axis=0,
                        keepdims=True)
                for ts in range(SUBLANES)
            ]
            outb = jnp.concatenate(parts, axis=0)          # (8, 128)
            slab = b * SUBLANES
            cur = out_ref[pl.ds(slab, SUBLANES), :]
            out_ref[pl.ds(slab, SUBLANES), :] = cur + outb

    return kern


def hub_relabel(a: CSR, min_hub_frac: float = 0.10):
    """(A[rowperm][:, colperm], colperm, rowperm): columns by descending
    popularity (hubs -> panel 0/1), rows by descending degree.

    When the would-be hub columns hold < ``min_hub_frac`` of the nnz the
    matrix has NO hub structure (e.g. a band matrix, where all columns are
    equally popular) and the popularity sort only destroys whatever column
    locality exists — the fem-band-1M tail shattered to fill 0.03 after
    relabeling vs ~0.8 in natural order. Return identity perms in that
    case; the panel-bound tail windows then ride the native locality."""
    m, n = a.shape
    pop = np.bincount(a.indices, minlength=n)
    nhub = HUB_PANELS * LANES
    hub_mass = int(np.sort(pop)[::-1][:nhub].sum()) if n > nhub else a.nnz
    if hub_mass < min_hub_frac * max(a.nnz, 1):
        ident_c = np.arange(n, dtype=np.int64)
        ident_r = np.arange(m, dtype=np.int64)
        return a, ident_c, ident_r
    colperm = np.argsort(-pop, kind="stable").astype(np.int64)
    deg = a.row_lengths
    rowperm = np.argsort(-deg, kind="stable").astype(np.int64)
    s = a.to_scipy().tocsr()[rowperm][:, colperm].tocsr()
    s.sort_indices()
    return CSR.from_scipy(s).astype(a.dtype), colperm, rowperm


# Rows above this degree split into virtual sub-rows before packing. A PSEG
# round offers a row 8 slots (hub body) or 1 slot per (s, sel) pair (tail
# body) on its single lane, so a Zipf mega-row (deg ~n/2) serializes into
# thousands of near-empty rounds: the fixed powerlaw-1M generator measured
# the tail at 63M rounds / fill 0.0015 / a 241 GiB schedule allocation.
# Splitting a deg-d row into ceil(d/8192) sub-rows (entries dealt
# round-robin so every sub-row samples the full column range) restores
# ~1 entry per slot; sub-row partials merge in the readout epilogue with
# one scatter-add over ~total_heavy_nnz/8192 elements (SURVEY.md §7 hard
# part 4: "split of ultra-heavy rows into multiple segments").
_SPLIT_DEG = 8192


def split_heavy_rows(ap: CSR, cap: int = _SPLIT_DEG):
    """(ap2, vown): ap with rows of degree > cap dealt into sub-rows.

    Sub-row 0 keeps the original row id; sub-rows j >= 1 of row r become
    virtual rows appended after m (grouped by r, in row order). ``vown``
    maps each virtual row back to its owner; None when nothing splits.
    """
    m, n = ap.shape
    deg = ap.row_lengths.astype(np.int64)
    v = -(-np.maximum(deg, 1) // cap)
    if not (v > 1).any():
        return ap, None
    import scipy.sparse as sp

    rows = ap.row_ids().astype(np.int64)
    occ = np.arange(ap.nnz, dtype=np.int64) - np.repeat(
        ap.indptr[:-1].astype(np.int64), deg)
    sub = occ % v[rows]
    vbase = np.concatenate([[0], np.cumsum(v - 1)[:-1]])
    rows2 = np.where(sub == 0, rows, m + vbase[rows] + sub - 1)
    n_virtual = int((v - 1).sum())
    m2 = m + n_virtual
    coo = sp.coo_matrix((ap.data, (rows2, ap.indices.astype(np.int64))),
                        shape=(m2, n)).tocsr()
    coo.sort_indices()
    vown = np.repeat(np.arange(m, dtype=np.int64)[v > 1], (v - 1)[v > 1])
    return CSR.from_scipy(coo).astype(ap.dtype), vown


class PallasSpmvScattered:
    """PSEG Pallas SpMV executor with hub relabeling (single chip)."""

    def __init__(self, a: CSR, *, th: int | None = None,
                 min_fill: float = 0.10,
                 reorder: bool = True, value_dtype=None,
                 divert_below: int | None = None,
                 hybrid: bool | None = None):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        if th is None:
            # e19/e21 (round 6): at th=256 the grid is step-overhead-bound
            # on multi-M-nnz graphs (~350 ns per step x rounds/32 steps).
            # th=1024 measured 54.3%->67.8% of STREAM on powerlaw-1M-102M
            # and 56.6%->65.2% on uk-2002@0.05 (14.4M nnz); th=512 is the
            # mid rung. Small matrices keep 256: the hybrid pack pads its
            # two streams to whole tiles and the unrolled th/8-round body
            # compiles slower, with too few steps saved to matter.
            th = (1024 if a.nnz >= 8_000_000
                  else 512 if a.nnz >= 2_000_000 else 256)
        from .spmv_pallas import check_value_dtype
        from ...utils.backend import on_cpu

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        x_bytes = (-(-n // 128) + 1) * 128 * 4
        if x_bytes > _VMEM_X_LIMIT:
            raise ValueError(
                f"x ({x_bytes >> 20} MB) exceeds VMEM staging limit; "
                "use the multi-chip partitioner"
            )

        if reorder:
            ap, colperm, rowperm = hub_relabel(a)
        else:
            colperm = np.arange(n, dtype=np.int64)
            rowperm = np.arange(m, dtype=np.int64)
            ap = a
        # Zipf mega-rows shatter the round packing (see split_heavy_rows);
        # deal them into virtual sub-rows merged at readout.
        ap, vown = split_heavy_rows(ap)
        self._m2 = ap.shape[0]
        self.n_virtual = self._m2 - m
        self._vown = (jnp.asarray(vown.astype(np.int32))
                      if vown is not None else None)

        # hybrid hub+tail packing (round 4): default on accelerators —
        # interpret mode pays per-op for the extra tail rounds, so CPU
        # keeps the divert-to-stragglers packing unless asked
        if hybrid is None:
            hybrid = not on_cpu() and divert_below is None
        w = None
        if hybrid:
            from ...retile_pseg import pack_pseg_hybrid

            w = pack_pseg_hybrid(ap, th=th)
        if w is None:
            w = pack_pseg(ap, th=th, divert_below=divert_below)
        if w.y_rows * LANES * 4 > _VMEM_Y_LIMIT:
            raise ValueError("y exceeds VMEM accumulator limit")
        if w.fill < min_fill:
            # even at low fill the kernel streams padding at ~421 GB/s —
            # orders of magnitude above the XLA bucket fallback — so the
            # threshold only rejects pathological packings (e14, round 4)
            raise ValueError(
                f"PSEG fill {w.fill:.2f} below {min_fill} even after hub "
                "relabeling; use the XLA bucket path"
            )
        self.layout = w
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        self.bytes_per_iter = (w.bytes_per_iter + n * 4 + m * 4
                               + w.n_stragglers * 12
                               - w.val.size * (4 - value_dtype.itemsize))
        self._colperm = jnp.asarray(colperm.astype(np.int32))
        inv_row = np.empty(m, dtype=np.int64)
        inv_row[rowperm] = np.arange(m)
        self._rowperm_inv = jnp.asarray(inv_row.astype(np.int32))
        self.colperm = colperm
        self.rowperm = rowperm
        # hybrid stream: rounds [0, n_hub) are win2 hub tiles, the rest
        # panel-bound tail tiles — run as TWO branchless pallas_calls whose
        # outputs add in the (fused) readout epilogue
        ns = w.th // SUBLANES
        if w.n_hub_rounds >= 0:
            self._tiles_h = max(w.n_hub_rounds // ns, 1)  # tile-aligned
        else:
            self._tiles_h = w.num_tiles                   # plain: all hub
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
        self._call = self._build(self._tiles_h, tail=False)
        self._call_t = (self._build(self._tiles_t, tail=True)
                        if self._tiles_t else None)

    def _build(self, num_tiles, *, tail: bool):
        w = self.layout
        from ...utils.backend import on_cpu

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d whole
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # whole y
        )
        return pl.pallas_call(
            _kernel(w.th, tail=tail),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((w.y_rows, LANES), jnp.float32),
            interpret=on_cpu(),
            cost_estimate=pl.CostEstimate(
                flops=int(2 * num_tiles * w.th * LANES * 9),
                bytes_accessed=int(num_tiles * w.th * LANES * 8),
                transcendentals=0,
            ),
        )

    def device_arrays(self):
        d = {"wr": self._wr, "ob": self._ob, "val": self._val,
             "lcol": self._lcol, "tsb": self._tsb,
             "srow": self._srow, "scol": self._scol, "sval": self._sval,
             "colperm": self._colperm, "rowinv": self._rowperm_inv}
        if self.n_virtual:
            d["vown"] = self._vown
        if self._tiles_t:
            d.update({"wr_t": self._wr_t, "ob_t": self._ob_t,
                      "val_t": self._val_t, "lcol_t": self._lcol_t,
                      "tsb_t": self._tsb_t})
        return d

    def apply_permuted(self, arrs, x_perm):
        """y_perm = A_perm @ x_perm — the fast path for iterative use:
        stay in hub-relabeled space, no permutation gathers."""
        m, n = self.shape
        w = self.layout
        pad = w.x2d_rows * 128 - n
        x2d = jnp.pad(x_perm.astype(jnp.float32), (0, pad)).reshape(-1, 128)
        y2d = self._call(arrs["wr"], arrs["ob"], x2d, arrs["val"],
                         arrs["lcol"], arrs["tsb"])
        if self._call_t is not None:
            y2d = y2d + self._call_t(arrs["wr_t"], arrs["ob_t"], x2d,
                                     arrs["val_t"], arrs["lcol_t"],
                                     arrs["tsb_t"])
        # y2d[blk*8+ts, tl] = y_perm[blk*1024 + ts*128 + tl] -> natural order
        flat = y2d.reshape(-1)
        if self.layout.n_stragglers:
            # sparse tail diverted at pack time (<0.5% of nnz on power-law):
            # XLA scatter-add is slow per element but the count is tiny.
            # Stragglers are in the SPLIT row space (ids may be virtual),
            # so add them before the sub-row merge.
            flat = flat.at[arrs["srow"]].add(arrs["sval"]
                                             * x_perm[arrs["scol"]])
        y = flat[:m]
        if self.n_virtual:
            # merge heavy-row sub-row partials (~heavy_nnz/8192 elements)
            y = y.at[arrs["vown"]].add(flat[m:self._m2])
        return y.astype(self.dtype)

    def apply_pure(self, arrs, x):
        """Drop-in y = A @ x: adds the two permutation gathers (XLA gather —
        slow on TPU; prefer apply_permuted for repeated products)."""
        x_perm = x[arrs["colperm"]]
        y_perm = self.apply_permuted(arrs, x_perm)
        return y_perm[arrs["rowinv"]]

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out


class PallasSpmvScatteredBig:
    """SpMV through the k-resident PSEG SpMM executor at kc=1 (round 6).

    The whole-VMEM executor above refuses matrices whose x2d (24 MB) or
    y2d (8 MB) exceed the VMEM ceilings — a full-scale uk-2002-class web
    graph (18.5M rows) needs 74 MB of each.  The k-resident executor
    (spmm_pseg) y-blocks the output behind a per-tile prefetch scalar and
    streams tail-Xt in 256-panel chunks, so no per-matrix VMEM ceiling
    remains; its SMEM prefetch-scalar cap is handled by group-range call
    splitting.  Same permuted-space interface as PallasSpmvScattered."""

    _kres = True

    def __init__(self, a: CSR, *, min_fill: float = 0.10,
                 reorder: bool = True, value_dtype=None):
        from .spmm_pseg import PallasSpmmScattered

        self._mm = PallasSpmmScattered(
            a, min_fill=min_fill, reorder=reorder, value_dtype=value_dtype,
            k_hint=1, kres=True, hybrid=True)
        self.layout = self._mm.layout
        self.value_dtype = self._mm.value_dtype
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        m, n = a.shape
        self.bytes_per_iter = self._mm.bytes_per_iter + (n + m) * 4
        self.colperm = self._mm.colperm
        self.rowperm = self._mm.rowperm
        self.n_virtual = self._mm.n_virtual

    def device_arrays(self):
        return self._mm.device_arrays()

    def apply_permuted(self, arrs, x_perm):
        return self._mm.apply_permuted(arrs, x_perm[:, None])[:, 0]

    def apply_pure(self, arrs, x):
        return self._mm.apply_pure(arrs, x[:, None])[:, 0]

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out
