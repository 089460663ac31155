"""Multi-chip SpMV over a 1D 'chips' mesh (SURVEY.md §3.4, BASELINE config #4).

Data flow per chip (shard_map body):

    x_full  = all_gather(x_shard, 'chips')        # ICI
    y_local = ELL-spmv(local shard, x_full)       # on-chip
    [nnz-split] y = psum_scatter(partial y)        # ICI

Partition strategies mirror the reference (even_rows / nnz_balanced row
splits; nnz_split with cut rows). Per-chip shards are retiled to a common
ELLPACK geometry so they stack into one sharded (ndev, rows_pad, W) array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..formats import CSR, INDEX_DTYPE
from ..partition import partition_rows, partition_nnz_split
from ..retile import to_ell
from .mesh import make_mesh, chips_axis

def _round_up(x, m):
    return ((x + m - 1) // m) * m

def _stack_ell(parts, n, dtype):
    """Retile each part to ELL and pad to common (rows_pad, width)."""
    ells = [to_ell(p) for p in parts]
    width = max(e.width for e in ells)
    rows_pad = max(_round_up(max(e.m, 1), 8) for e in ells)
    ndev = len(parts)
    col = np.zeros((ndev, rows_pad, width), dtype=INDEX_DTYPE)
    val = np.zeros((ndev, rows_pad, width), dtype=dtype)
    for d, e in enumerate(ells):
        col[d, : e.col.shape[0], : e.width] = e.col
        val[d, : e.val.shape[0], : e.width] = e.val
    return col, val, rows_pad, width

class DistSpmvPlan:
    """Partition + retile + shard_map executor for one matrix on one mesh.

    Local compute inside the shard_map body is the single-chip Pallas w-SELL
    kernel whenever the shards are Pallas-servable (f32, dense-enough fill,
    VMEM fits); otherwise the XLA ELL gather body. ``local_method`` records
    which."""

    def __init__(self, a: CSR, mesh: Mesh | None = None, *,
                 strategy: str = "nnz_balanced", local_method: str = "auto",
                 min_fill: float = 0.2, th: int = 1024):
        self._min_fill = min_fill
        self._th = th
        self.mesh = mesh or make_mesh()
        ndev = self.mesh.devices.size
        self.ndev = ndev
        self.shape = a.shape
        self.dtype = a.dtype
        self.strategy = strategy
        m, n = a.shape
        self.x_chunk = _round_up(max(-(-n // ndev), 1), 8)
        self.n_pad = self.x_chunk * ndev

        sh = lambda spec: NamedSharding(self.mesh, spec)

        if strategy in ("even_rows", "nnz_balanced"):
            part = partition_rows(a, ndev, strategy)
            self.nnz_balance = part.balance()
            self._split = False
            local_parts = part.parts
            row_starts = [int(r) for r in part.row_starts]
        elif strategy == "nnz_split":
            part = partition_nnz_split(a, ndev)
            self._split = True
            # partial-y merge via psum: express each shard in GLOBAL row
            # coordinates (full (m, n) shape, empty rows elsewhere)
            from ..formats import COO, coo_to_csr

            local_parts = []
            for d, p in enumerate(part.parts):
                coo = p.tocoo()
                r0 = int(part.first_row[d])
                local_parts.append(coo_to_csr(COO(
                    (m, n), coo.row.astype(np.int64) + r0, coo.col, coo.data
                )))
            row_starts = None
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

        self.local_method = None
        if local_method in ("auto", "pallas"):
            try:
                self._init_pallas(local_parts, row_starts, sh)
                self.local_method = "pallas"
            except ValueError:
                if local_method == "pallas":
                    raise
        if self.local_method is None and local_method in ("auto", "pseg"):
            # scattered/power-law shards: hub-relabeled packed-segment path
            try:
                self._init_pseg(a, part, sh)
                self.local_method = "pseg"
            except ValueError:
                if local_method == "pseg":
                    raise
        if self.local_method is None:
            self._init_ell(local_parts, row_starts, sh, a)
            self.local_method = "ell"

        self._x_sharding = sh(P(chips_axis))
        self._build_fn()

    def _init_pallas(self, parts, row_starts, sh):
        from .wsell_stack import stack_wsell

        m, n = self.shape
        st = stack_wsell(parts, self.n_pad, self.dtype,
                         min_fill=self._min_fill, th=self._th)
        self._stacked = st
        self.bytes_per_iter = st.bytes_per_iter * self.ndev
        self._val = jax.device_put(st.val, sh(P(chips_axis)))
        self._lcol = jax.device_put(st.lcol, sh(P(chips_axis)))
        self._wr = jax.device_put(st.wrow, sh(P(chips_axis)))
        self._ob = jax.device_put(st.obase, sh(P(chips_axis)))
        if not self._split:
            slot = np.empty(m, dtype=np.int64)
            for d in range(self.ndev):
                r0, r1 = row_starts[d], row_starts[d + 1]
                slot[r0:r1] = d * st.y_rows * st.sub + np.arange(r1 - r0)
            self._unpad = jnp.asarray(slot.astype(INDEX_DTYPE))

    def _init_pseg(self, a, part, sh):
        from .wsell_stack import hub_stack_pseg, hub_stack_pseg_split

        if self._split:
            # nnz-split: global row/col permutation + equal-nnz ranges of
            # global-shape shards whose partial y2d outputs psum-merge
            st, colperm = hub_stack_pseg_split(a, self.ndev, self.n_pad,
                                               min_fill=self._min_fill)
        else:
            # global hub relabeling of columns; rows unaffected, so the
            # nnz-balanced row partition is re-applied to the relabeled matrix
            row_starts = [int(r) for r in part.row_starts]
            st, colperm = hub_stack_pseg(a, row_starts, self.n_pad,
                                         min_fill=self._min_fill)
        self._pstacked = st
        self._pseg_colperm = colperm
        self.bytes_per_iter = st.bytes_per_iter * self.ndev
        self._pwr = jax.device_put(st.wrow, sh(P(chips_axis)))
        self._pob = jax.device_put(st.oblk, sh(P(chips_axis)))
        self._pval = jax.device_put(st.val, sh(P(chips_axis)))
        self._plcol = jax.device_put(st.lcol, sh(P(chips_axis)))
        self._ptsb = jax.device_put(st.tsb, sh(P(chips_axis)))
        self._psrow = jax.device_put(st.s_rows, sh(P(chips_axis)))
        self._pscol = jax.device_put(st.s_cols, sh(P(chips_axis)))
        self._psval = jax.device_put(st.s_vals, sh(P(chips_axis)))
        self._unpad = jnp.asarray(st.rowperm_inv.astype(INDEX_DTYPE))

    def _init_ell(self, parts, row_starts, sh, a):
        m, n = self.shape
        ndev = self.ndev
        if not self._split:
            col, val, rows_pad, width = _stack_ell(parts, n, a.dtype)
            self.rows_pad = rows_pad
            # map padded slots -> original rows for the final unpad gather
            slot = np.empty(m, dtype=np.int64)
            for d in range(ndev):
                r0, r1 = row_starts[d], row_starts[d + 1]
                slot[r0:r1] = d * rows_pad + np.arange(r1 - r0)
            self._unpad = jnp.asarray(slot.astype(INDEX_DTYPE))
        else:
            # parts are already global-shape; ELL them into m_pad rows
            m_pad = _round_up(m, 8)
            ells = [to_ell(p) for p in parts]
            width = max(e.width for e in ells)
            col = np.zeros((ndev, m_pad, width), dtype=INDEX_DTYPE)
            val = np.zeros((ndev, m_pad, width), dtype=a.dtype)
            for d, e in enumerate(ells):
                if e.m:
                    col[d, : e.m, : e.width] = e.col[: e.m]
                    val[d, : e.m, : e.width] = e.val[: e.m]
            self.rows_pad = m_pad
        self._col = jax.device_put(col, sh(P(chips_axis)))
        self._val = jax.device_put(val, sh(P(chips_axis)))
        self.bytes_per_iter = col.size * (a.data.itemsize + 4)

    def _build_fn(self):
        if self.local_method == "pallas":
            self._build_fn_pallas()
        elif self.local_method == "pseg":
            self._build_fn_pseg()
        else:
            self._build_fn_ell()

    def _build_fn_pseg(self):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops.kernels.spmv_pseg import _kernel
        from ..retile_pseg import LANES
        from ..utils.backend import on_cpu

        m, n = self.shape
        st = self._pstacked
        n_pad = self.n_pad
        xpad = st.x2d_rows * LANES - n_pad

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(st.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d whole
                pl.BlockSpec((st.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((st.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((st.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(st.th),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((st.y_rows, LANES), jnp.float32),
            interpret=on_cpu(),
        )

        split = self._split

        def body(wr, ob, val, lcol, tsb, srow, scol, sval, x_shard):
            with jax.named_scope("collective"):
                x_full = lax.all_gather(x_shard, chips_axis, tiled=True)
            x2d = jnp.pad(x_full.astype(jnp.float32),
                          (0, xpad)).reshape(st.x2d_rows, LANES)
            with jax.named_scope("kernel"):
                y2d = call(wr[0], ob[0], x2d, val[0], lcol[0], tsb[0])
            y = y2d.reshape(-1)
            # straggler COO side-path (tiny count; see retile_pseg)
            y = y.at[srow[0]].add(sval[0] * x_full[scol[0]])
            if split:
                # global-shape shards (cut rows held partially by two
                # chips): one psum merges the partial products
                with jax.named_scope("collective"):
                    y = lax.psum(y, chips_axis)
            return y[None]

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(chips_axis),) * 8 + (P(chips_axis),),
            out_specs=P(None, None) if split else P(chips_axis, None),
            check_vma=False,
        )
        unpad = self._unpad
        dtype = self.dtype

        @jax.jit
        def run(wr, ob, val, lcol, tsb, srow, scol, sval, x_pad):
            y = fn(wr, ob, val, lcol, tsb, srow, scol, sval, x_pad)
            return y.reshape(-1)[unpad].astype(dtype)

        self._run_pseg = run

    def _build_fn_pallas(self):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops.kernels.spmv_pallas import _kernel
        from ..retile_wsell import LANES
        from ..utils.backend import on_cpu

        m, n = self.shape
        st = self._stacked
        n_pad = self.n_pad
        split = self._split
        xpad = st.x2d_rows * LANES - n_pad

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(st.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d whole
                pl.BlockSpec((st.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((st.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(st.th, st.sub, st.nwin, st.wgroup),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((st.y_rows, st.sub), jnp.float32),
            interpret=on_cpu(),
        )

        def body(wr, ob, val, lcol, x_shard):
            with jax.named_scope("collective"):
                x_full = lax.all_gather(x_shard, chips_axis, tiled=True)
            x2d = jnp.pad(x_full.astype(jnp.float32),
                          (0, xpad)).reshape(st.x2d_rows, LANES)
            with jax.named_scope("kernel"):
                y = call(wr[0], ob[0], x2d, val[0], lcol[0])  # (y_rows, sub)
            if split:
                with jax.named_scope("collective"):
                    y = lax.psum(y, chips_axis)
            return y[None]

        out_spec = P(None, None, None) if split else P(chips_axis, None, None)
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(chips_axis),) * 4 + (P(chips_axis),),
            out_specs=out_spec,
            check_vma=False,
        )
        dtype = self.dtype

        if split:
            @jax.jit
            def run(wr, ob, val, lcol, x_pad):
                y = fn(wr, ob, val, lcol, x_pad)
                return y.reshape(-1)[:m].astype(dtype)
        else:
            unpad = self._unpad

            @jax.jit
            def run(wr, ob, val, lcol, x_pad):
                y = fn(wr, ob, val, lcol, x_pad)  # (ndev, y_rows, sub)
                return y.reshape(-1)[unpad].astype(dtype)

        self._run_pallas = run

    def _build_fn_ell(self):
        m, n = self.shape
        n_pad, ndev = self.n_pad, self.ndev
        split = self._split

        def body(col, val, x_shard):
            # col/val: (1, rows_pad, W) local; x_shard: (x_chunk,)
            with jax.named_scope("collective"):
                x_full = lax.all_gather(x_shard, chips_axis, tiled=True)
            with jax.named_scope("kernel"):
                y_loc = jnp.sum(val[0] * x_full[col[0]], axis=1)
            if split:
                with jax.named_scope("collective"):
                    y_loc = lax.psum(y_loc, chips_axis)
            return y_loc[None]

        out_spec = P(None, None) if split else P(chips_axis, None)
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(chips_axis), P(chips_axis), P(chips_axis)),
            out_specs=out_spec,
            check_vma=False,
        )

        if split:
            @jax.jit
            def run(col, val, x_pad):
                y = fn(col, val, x_pad)  # (1, m_pad) replicated-ish
                return y.reshape(-1)[:m]
        else:
            unpad = self._unpad

            @jax.jit
            def run(col, val, x_pad):
                y = fn(col, val, x_pad)  # (ndev, rows_pad) sharded
                return y.reshape(-1)[unpad]

        self._run = run

    def __call__(self, x, alpha: float = 1.0, beta: float = 0.0, y=None):
        m, n = self.shape
        x = jnp.asarray(x, dtype=self.dtype)
        if x.shape != (n,):
            raise ValueError(f"x must have shape ({n},)")
        if self.local_method == "pseg":
            # hub-relabeled x (host-side permute: cheap vs an XLA gather)
            x = jnp.asarray(
                np.asarray(x)[self._pseg_colperm], dtype=self.dtype
            )
        x_pad = jnp.zeros(self.n_pad, dtype=self.dtype).at[:n].set(x)
        x_pad = jax.device_put(x_pad, self._x_sharding)
        if self.local_method == "pallas":
            out = self._run_pallas(self._wr, self._ob, self._val, self._lcol,
                                   x_pad)
        elif self.local_method == "pseg":
            out = self._run_pseg(self._pwr, self._pob, self._pval,
                                 self._plcol, self._ptsb, self._psrow,
                                 self._pscol, self._psval, x_pad)
        else:
            out = self._run(self._col, self._val, x_pad)
        out = alpha * out
        if y is not None:
            out = out + beta * jnp.asarray(y, dtype=self.dtype)
        elif beta != 0.0:
            raise ValueError("beta != 0 requires y")
        return out

    def device_arrays(self):
        """Matrix-side device arrays as one tuple, for passing through jit
        arguments (the axon rule: device arrays must never be closure
        constants — see DESIGN.md). Pair with :meth:`apply_pure` so solver
        loops (``parallel/solvers_dist.py``) keep the whole Krylov
        iteration on-device."""
        if self.local_method == "pallas":
            return (self._wr, self._ob, self._val, self._lcol)
        if self.local_method == "pseg":
            return (self._pwr, self._pob, self._pval, self._plcol,
                    self._ptsb, self._psrow, self._pscol, self._psval,
                    jnp.asarray(
                        np.asarray(self._pseg_colperm).astype(INDEX_DTYPE)))
        return (self._col, self._val)

    def apply_pure(self, arrs, x):
        """Pure ``y = A @ x`` on global (n,)→(m,) vectors, jit-composable:
        no host work, so a ``lax.while_loop`` can call it every iteration.
        The pseg path pays one device gather for the hub column relabeling
        (``__call__`` does that permute on the host instead)."""
        m, n = self.shape
        x = jnp.asarray(x, dtype=self.dtype)
        if self.local_method == "pseg":
            *arrs_k, colperm = arrs
            x = jnp.take(x, colperm)
        x_pad = jnp.zeros(self.n_pad, dtype=self.dtype).at[:n].set(x)
        x_pad = jax.lax.with_sharding_constraint(x_pad, self._x_sharding)
        if self.local_method == "pallas":
            return self._run_pallas(*arrs, x_pad)
        if self.local_method == "pseg":
            return self._run_pseg(*arrs_k, x_pad)
        return self._run(*arrs, x_pad)

class RingSpmvPlan:
    """Ring SpMV: x stays sharded; shards rotate around the ring with
    `ppermute` while each chip accumulates the matching column block's
    partial product (SURVEY.md §5 "long-context" analogue — the SpMV
    equivalent of ring attention, for x too large to replicate in HBM).

    Per chip d, the local rows are split into ndev column blocks; at ring
    step k the chip holds x shard (d+k) mod ndev and applies block
    A[rows_d, cols_{(d+k) mod ndev}]. ndev steps; each moves x_chunk over
    ICI once — total traffic equals one all_gather, but peak memory is one
    shard instead of the full x."""

    def __init__(self, a: CSR, mesh: Mesh | None = None, *,
                 strategy: str = "nnz_balanced"):
        self.mesh = mesh or make_mesh()
        ndev = int(self.mesh.devices.size)
        self.ndev = ndev
        self.shape = a.shape
        self.dtype = a.dtype
        m, n = a.shape
        self.x_chunk = _round_up(max(-(-n // ndev), 1), 8)
        self.n_pad = self.x_chunk * ndev

        part = partition_rows(a, ndev, strategy)
        # split each chip's rows by column block; one ELL per ring offset k
        # covering block (d, (d+k) % ndev), indices local to the block.
        per_offset = []  # k -> (col, val) stacked over chips
        rows_pad = max(_round_up(max(p.shape[0], 1), 8) for p in part.parts)
        self.rows_pad = rows_pad
        sh = lambda spec: NamedSharding(self.mesh, spec)
        for k in range(ndev):
            blocks = []
            for d, p in enumerate(part.parts):
                src_blk = (d + k) % ndev
                c0 = src_blk * self.x_chunk
                c1 = min(c0 + self.x_chunk, n)
                coo = p.tocoo()
                sel = (coo.col >= c0) & (coo.col < c1)
                from ..formats import COO, coo_to_csr

                blk = coo_to_csr(COO((p.shape[0], self.x_chunk),
                                     coo.row[sel], coo.col[sel] - c0,
                                     coo.data[sel]))
                blocks.append(to_ell(blk))
            width = max(max(e.width for e in blocks), 8)
            col = np.zeros((ndev, rows_pad, width), dtype=INDEX_DTYPE)
            val = np.zeros((ndev, rows_pad, width), dtype=a.dtype)
            for d, e in enumerate(blocks):
                col[d, : e.col.shape[0], : e.width] = e.col
                val[d, : e.val.shape[0], : e.width] = e.val
            per_offset.append((
                jax.device_put(col, sh(P(chips_axis))),
                jax.device_put(val, sh(P(chips_axis))),
            ))
        self._per_offset = per_offset
        slot = np.empty(m, dtype=np.int64)
        for d in range(ndev):
            r0, r1 = int(part.row_starts[d]), int(part.row_starts[d + 1])
            slot[r0:r1] = d * rows_pad + np.arange(r1 - r0)
        self._unpad = jnp.asarray(slot.astype(INDEX_DTYPE))
        self._x_sharding = sh(P(chips_axis))
        self.bytes_per_iter = sum(
            c.size * (a.data.itemsize + 4) for c, v in per_offset
        )
        self._build()

    def _build(self):
        ndev = self.ndev
        rows_pad = self.rows_pad
        shift = [(i, (i - 1) % ndev) for i in range(ndev)]

        def body(x_shard, *offset_arrays):
            xcur = x_shard[0]
            y = jnp.zeros((rows_pad,), dtype=xcur.dtype)
            for k in range(ndev):
                col, val = offset_arrays[2 * k], offset_arrays[2 * k + 1]
                y = y + jnp.sum(val[0] * xcur[col[0]], axis=1)
                if k + 1 < ndev:
                    xcur = lax.ppermute(xcur, chips_axis, shift)
            return y[None]

        flat_specs = tuple(P(chips_axis) for _ in range(2 * ndev))
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(chips_axis),) + flat_specs,
            out_specs=P(chips_axis, None),
            check_vma=False,
        )
        unpad = self._unpad

        @jax.jit
        def run(x_pad, *offset_arrays):
            y = fn(x_pad[:, None].reshape(self.ndev, -1), *offset_arrays)
            return y.reshape(-1)[unpad]

        self._run = run

    def __call__(self, x):
        m, n = self.shape
        x = jnp.asarray(x, dtype=self.dtype)
        if x.shape != (n,):
            raise ValueError(f"x must have shape ({n},)")
        x_pad = jnp.zeros(self.n_pad, dtype=self.dtype).at[:n].set(x)
        x_pad = jax.device_put(x_pad, self._x_sharding)
        flat = []
        for col, val in self._per_offset:
            flat.extend([col, val])
        return self._run(x_pad, *flat)

def dist_spmv(a: CSR, x, mesh: Mesh | None = None, *,
              strategy: str = "nnz_balanced", alpha: float = 1.0,
              beta: float = 0.0, y=None):
    """One-shot distributed SpMV (plan not cached; build a DistSpmvPlan for
    repeated use)."""
    return DistSpmvPlan(a, mesh, strategy=strategy)(x, alpha, beta, y)
