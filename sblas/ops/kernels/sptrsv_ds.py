"""f64-class SpTRSV: f32 wavefront solves + double-single residual
refinement, all in slot space (opt-in ``method='pallas_ds'``).

Why refinement instead of a two-plane port of the wavefront kernel: e24
measured the wavefront round body ISSUE-bound — the gather chain runs at
the VPU issue rate (175 ns of the 349 ns/round), so carrying hi/lo planes
through the kernel would roughly double every round's gather/select chain
and the solve cost with it. Mixed-precision iterative refinement instead
reuses the measured-frontier f32 kernel unchanged and pays ~2 extra f32
solves plus 2 double-single SpMVs — classic Wilkinson IR with the residual
at ~2^-48 precision (the TPU-native analogue of the reference's native-f64
CUDA solve, SURVEY.md C8 fp64 row; VERDICT r2 item 4).

The whole refine loop is one jittable chain with ZERO permutation gathers:
the residual SpMV is packed on the SLOT-RENUMBERED system Ls (row/col i ->
slot_of_row[i], shape (num_blocks*128,)^2), so the wavefront's x2d output
``x2d[:num_blocks].reshape(-1)`` IS the ds-SpMV input vector, and the
residual reshapes straight back into the solve's b2d layout. Padded slots
are empty rows/columns of Ls: garbage there neither propagates (no Ls
column reads it) nor escapes (the host readout gathers real slots only).

Error model: the converged solution inherits the residual's double-single
precision, rel err ~ max_row_deg * 2^-48 per matvec term (measured 1e-13
class on the suite factors); convergence needs eps_f32 * cond(L) < 1 —
same condition under which the f32 solve's own validation passes. Like
spmv_wsell_ds this is an error MODEL, not IEEE f64 semantics; the strict
XLA f64 path remains the auto default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...formats import CSR
from .spmv_wsell_ds import PallasSpmvDS, _two_sum, _quick_two_sum
from .sptrsv_pallas import PallasSptrsv, PallasSptrsvLanes, SUBLANES, SUB


def _slot_system(l: CSR, slot_of_row, s_dim: int, unit_diagonal: bool) -> CSR:
    """Slot-renumbered residual system Ls (f64): Ls[slot[i], slot[j]] =
    L[i, j], unit diagonal materialized if implicit. Padded slots are empty
    rows/columns — garbage there neither propagates nor escapes (shared by
    the SpTRSV and SpTRSM ds paths)."""
    import scipy.sparse as sp

    slot = np.asarray(slot_of_row, dtype=np.int64)
    coo = l.tocoo()
    rows, cols, vals = coo.row, coo.col, coo.data.astype(np.float64)
    if unit_diagonal:
        off = rows != cols
        rows, cols, vals = rows[off], cols[off], vals[off]
        dg = np.arange(l.shape[0], dtype=np.int64)
        rows = np.concatenate([rows, dg])
        cols = np.concatenate([cols, dg])
        vals = np.concatenate([vals, np.ones(l.shape[0])])
    ls = sp.coo_matrix(
        (vals, (slot[rows], slot[cols])), shape=(s_dim, s_dim)
    ).tocsr()
    ls.sort_indices()
    return CSR.from_scipy(ls)


class PallasSptrsvDS:
    """f64-class triangular solve: f32 VMEM wavefront + slot-space
    double-single residual refinement. numpy f64 at the boundary."""

    def __init__(self, l: CSR, *, lower: bool = True,
                 unit_diagonal: bool = False, refine_iters: int = 2,
                 min_fill: float = 0.0):
        if l.dtype != np.float64:
            raise ValueError("pallas_ds is the f64 path; use method="
                             "'pallas' for f32")
        self._tr = PallasSptrsv(l.astype(np.float32), lower=lower,
                                unit_diagonal=unit_diagonal)
        lay = self._tr.layout
        self.layout = lay
        self.shape = l.shape
        self.dtype = l.dtype
        self.nnz = l.nnz
        self.nlevels = self._tr.nlevels
        self.refine_iters = int(refine_iters)

        ls = _slot_system(l, lay.slot_of_row, lay.num_blocks * 128,
                          unit_diagonal)
        # min_fill defaults to 0 (no rejection): pallas_ds is opt-in, fill
        # only prices the residual stream (charged honestly below and
        # reported as ds_spmv_fill), and the alternative XLA-f64 path is
        # three orders slower. Context: the level renumbering
        # interleaves distant rows, so band factors pack the slot-space
        # residual at fill ~0.04 (measured on the 62K/30/4000 suite factor;
        # chol-nd packs at 0.14). Streaming that padding still beats the
        # alternative — two 62K-row XLA permutation gathers per refinement
        # (~0.2 Gelem/s on TPU) cost more than the extra padded bytes at
        # stream rate, and the bytes model below charges the padding
        # honestly. The suite records carry ds_spmv_fill so the overhead
        # is visible.
        self._ds = PallasSpmvDS(ls, min_fill=min_fill)
        # one solve + refine_iters * (ds SpMV + solve) + plane traffic
        self.bytes_per_iter = (
            (1 + self.refine_iters) * self._tr.bytes_per_iter
            + self.refine_iters * self._ds.bytes_per_iter
        )

    def device_arrays(self):
        return {"tr": self._tr.device_arrays(),
                "ds": self._ds.device_arrays()}

    def solve_planes(self, arrs, bh_s, bl_s):
        """Jittable core: slot-space f32 hi/lo planes of b in -> slot-space
        hi/lo planes of x out (each (num_blocks*128,))."""
        tr, ds = arrs["tr"], arrs["ds"]
        lay = self.layout
        nb = lay.num_blocks

        def solve(r_s):
            r2d = r_s.reshape(nb * SUBLANES, SUB) * tr["invd"]
            x2d = self._tr.solve_permuted(tr, r2d)
            return x2d[:nb].reshape(-1)

        xh = solve(bh_s)
        xl = jnp.zeros_like(xh)
        for _ in range(self.refine_iters):
            yh, yl = self._ds.apply_pure(ds, xh, xl)
            # r = b - y in double-single
            sh, e = _two_sum(bh_s, -yh)
            rl = (bl_s - yl) + e
            rh, rl = _quick_two_sum(sh, rl)
            d = solve(rh + rl)
            xh, e2 = _two_sum(xh, d)
            xh, xl = _quick_two_sum(xh, xl + e2)
        return xh, xl

    def b_to_planes(self, b: np.ndarray):
        """Host-side: f64 b -> slot-space f32 hi/lo planes (numpy)."""
        lay = self.layout
        b = np.asarray(b, dtype=np.float64)
        b_s = np.zeros(lay.num_blocks * 128, dtype=np.float64)
        b_s[np.asarray(lay.slot_of_row)] = b
        bh = b_s.astype(np.float32)
        bl = (b_s - bh.astype(np.float64)).astype(np.float32)
        return bh, bl

    def planes_to_x(self, xh, xl) -> np.ndarray:
        """Host-side: slot-space hi/lo planes -> f64 x in row order."""
        lay = self.layout
        x_s = (np.asarray(xh, dtype=np.float64)
               + np.asarray(xl, dtype=np.float64))
        return x_s[np.asarray(lay.slot_of_row)]

    def __call__(self, b) -> np.ndarray:
        bh, bl = self.b_to_planes(b)
        xh, xl = jax.jit(self.solve_planes)(
            self.device_arrays(), jnp.asarray(bh), jnp.asarray(bl))
        return self.planes_to_x(xh, xl)


class PallasSptrsmDS:
    """f64-class multi-RHS triangular solve (VERDICT r3 item 5): the
    RHS-on-sublanes f32 lanes wavefront (one schedule pass serves all
    MAX_RHS=8 columns) + slot-space double-single residual refinement.

    The composition is gather-free like PallasSptrsvDS: the lanes kernel's
    block-tiled layout (row blk*8 + kk, lane = slot % 128) converts to/from
    per-column slot vectors (k, num_blocks*128) by pure reshape/transpose,
    so the whole refine chain — solve, k ds residual SpMVs on the
    slot-renumbered Ls, plane updates — jits as one computation with numpy
    f64 only at the boundary. Residual bytes are charged per COLUMN (each
    of the MAX_RHS ds SpMV calls re-streams the Ls schedule; the shared
    pass is the SOLVE, which is the latency-bound part worth sharing)."""

    MAX_RHS = PallasSptrsvLanes.MAX_RHS

    def __init__(self, l: CSR, *, lower: bool = True,
                 unit_diagonal: bool = False, refine_iters: int = 2,
                 min_fill: float = 0.0):
        if l.dtype != np.float64:
            raise ValueError("pallas_ds is the f64 path; use method="
                             "'pallas' for f32")
        self._tr = PallasSptrsvLanes(l.astype(np.float32), lower=lower,
                                     unit_diagonal=unit_diagonal)
        lay = self._tr.layout
        self.layout = lay
        self.shape = l.shape
        self.dtype = l.dtype
        self.nnz = l.nnz
        self.nlevels = self._tr.nlevels
        self.refine_iters = int(refine_iters)
        ls = _slot_system(l, lay.slot_of_row, lay.num_blocks * 128,
                          unit_diagonal)
        self._ds = PallasSpmvDS(ls, min_fill=min_fill)
        # per-slot 1/diag for scaling refinement RHS inside the chain (the
        # lanes kernel expects b3d pre-scaled; dense-tail slots carry 1.0)
        self._invd_slot = jnp.asarray(
            np.asarray(lay.inv_diag).reshape(-1).astype(np.float32))
        # one lanes solve + refine * (MAX_RHS ds SpMVs + lanes solve)
        self.bytes_per_iter = (
            (1 + self.refine_iters) * self._tr.bytes_per_iter
            + self.refine_iters * self.MAX_RHS * self._ds.bytes_per_iter
        )

    def device_arrays(self):
        return {"tr": self._tr.device_arrays(),
                "ds": self._ds.device_arrays(),
                "invd": self._invd_slot}

    def _slot_to_b3d(self, v):
        """(MAX_RHS, nb*128) slot planes -> (nb*8, 128) b3d tile layout."""
        nb = self.layout.num_blocks
        return v.reshape(self.MAX_RHS, nb, 128).transpose(1, 0, 2) \
                .reshape(nb * SUBLANES, 128)

    def _x2d_to_slot(self, x2d):
        """lanes x2d head -> (MAX_RHS, nb*128) slot planes."""
        nb = self.layout.num_blocks
        return x2d[: nb * SUBLANES].reshape(nb, self.MAX_RHS, 128) \
                                   .transpose(1, 0, 2) \
                                   .reshape(self.MAX_RHS, nb * 128)

    def solve_planes(self, arrs, bh_s, bl_s):
        """Jittable core: slot-space f32 hi/lo planes of B in (each
        (MAX_RHS, num_blocks*128)) -> slot-space hi/lo planes of X out."""
        tr, ds = arrs["tr"], arrs["ds"]
        invd = arrs["invd"]

        def solve(r_s):
            b3d = self._slot_to_b3d(r_s * invd[None, :])
            return self._x2d_to_slot(self._tr.solve_permuted(tr, b3d))

        xh = solve(bh_s)
        xl = jnp.zeros_like(xh)
        for _ in range(self.refine_iters):
            cols = [self._ds.apply_pure(ds, xh[kk], xl[kk])
                    for kk in range(self.MAX_RHS)]
            yh = jnp.stack([c[0] for c in cols])
            yl = jnp.stack([c[1] for c in cols])
            sh, e = _two_sum(bh_s, -yh)
            rl = (bl_s - yl) + e
            rh, rl = _quick_two_sum(sh, rl)
            d = solve(rh + rl)
            xh, e2 = _two_sum(xh, d)
            xh, xl = _quick_two_sum(xh, xl + e2)
        return xh, xl

    def b_to_planes(self, b: np.ndarray):
        """Host-side: f64 B (n, k<=MAX_RHS) -> slot-space f32 hi/lo planes
        (MAX_RHS, num_blocks*128), padded columns zero."""
        lay = self.layout
        b = np.asarray(b, dtype=np.float64)
        if b.ndim != 2 or b.shape[1] > self.MAX_RHS:
            raise ValueError(
                f"B must be (n, k<={self.MAX_RHS}), got {b.shape}")
        b_s = np.zeros((self.MAX_RHS, lay.num_blocks * 128),
                       dtype=np.float64)
        b_s[: b.shape[1], np.asarray(lay.slot_of_row)] = b.T
        bh = b_s.astype(np.float32)
        bl = (b_s - bh.astype(np.float64)).astype(np.float32)
        return bh, bl

    def planes_to_x(self, xh, xl, k: int) -> np.ndarray:
        """Host-side: slot-space hi/lo planes -> f64 X (n, k) row order."""
        lay = self.layout
        x_s = (np.asarray(xh, dtype=np.float64)
               + np.asarray(xl, dtype=np.float64))
        return x_s[:k, np.asarray(lay.slot_of_row)].T

    def __call__(self, b) -> np.ndarray:
        b = np.asarray(b, dtype=np.float64)
        if b.ndim != 2:
            raise ValueError(f"B must be 2-D (n, k), got {b.shape}")
        solve = jax.jit(self.solve_planes)
        arrs = self.device_arrays()
        outs = []
        for c0 in range(0, b.shape[1], self.MAX_RHS):
            bc = b[:, c0: c0 + self.MAX_RHS]
            bh, bl = self.b_to_planes(bc)
            xh, xl = solve(arrs, jnp.asarray(bh), jnp.asarray(bl))
            outs.append(self.planes_to_x(xh, xl, bc.shape[1]))
        return np.concatenate(outs, axis=1)
