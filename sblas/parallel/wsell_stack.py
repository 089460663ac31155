"""Stack per-chip w-SELL layouts to a common geometry for shard_map.

The distributed plans' local compute must be the same Pallas w-SELL kernel
as the single-chip fast path (measured ~80% of STREAM) — not the jnp ELL
gather (~1 GB/s on TPU). shard_map is SPMD: every chip must run the SAME
pallas_call, so the per-chip layouts are packed with a forced common
(th, sub, nwin, wgroup) and padded to a common (num_tiles, y_rows). Padding
tiles hold val=0 / obase=0 rounds, which accumulate zeros into slab 0 — the
same harmless scheme pack_wsell itself uses for tile padding.

Raises ValueError when the matrix shard set isn't Pallas-servable (f64, low
aggregate fill, VMEM limits) — callers fall back to the XLA ELL body.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..formats import CSR
from ..retile_wsell import pack_wsell, pick_sub, SUBLANES, LANES

VMEM_X_LIMIT = 24 * (1 << 20)
VMEM_Y_LIMIT = 8 * (1 << 20)


@dataclasses.dataclass(frozen=True, eq=False)
class StackedWSell:
    ndev: int
    th: int
    sub: int
    nwin: int
    wgroup: int
    num_tiles: int
    y_rows: int
    x2d_rows: int         # includes the nwin=2 guard row and covers n_pad
    n_pad: int
    val: np.ndarray       # (ndev, T*th, 128)
    lcol: np.ndarray      # (ndev, T*th, 128) int16
    wrow: np.ndarray      # (ndev, T*th/8) int32
    obase: np.ndarray     # (ndev, T*th/8) int32
    fill: float
    bytes_per_iter: int   # per-chip stream bytes (max over chips)


def stack_wsell(parts: list[CSR], n_pad: int, dtype, *, th: int = 1024,
                nwin: int = 2, wgroup: int = 4, min_fill: float = 0.2,
                sub: int = 0) -> StackedWSell:
    if dtype == np.float64:
        raise ValueError("Mosaic has no f64; use the XLA dist path")
    if sub <= 0:
        # nnz-weighted vote over shards for a common lane-segment width
        votes: dict[int, int] = {}
        for p in parts:
            s = pick_sub(p)
            votes[s] = votes.get(s, 0) + max(p.nnz, 1)
        sub = max(votes, key=lambda k: votes[k])

    lays = [pack_wsell(p, th=th, sub=sub, nwin=nwin, wgroup=wgroup)
            for p in parts]
    total_nnz = sum(l.nnz for l in lays)
    total_slots = sum(l.val.size for l in lays)
    fill = total_nnz / max(total_slots, 1)
    if fill < min_fill:
        raise ValueError(
            f"aggregate w-SELL fill {fill:.2f} below {min_fill} (scattered "
            "columns); use the XLA dist path"
        )

    ndev = len(parts)
    T = max(l.num_tiles for l in lays)
    y_rows = max(l.y_rows for l in lays)
    x2d_rows = max(max(l.x2d_rows for l in lays), -(-n_pad // LANES))
    if x2d_rows * LANES * 4 > VMEM_X_LIMIT:
        raise ValueError(
            f"gathered x ({x2d_rows * LANES * 4 >> 20} MB) exceeds VMEM "
            "staging limit; use the ring plan or the XLA dist path"
        )
    if y_rows * sub * 4 > VMEM_Y_LIMIT:
        raise ValueError("local y exceeds VMEM accumulator limit")

    ns = th // SUBLANES
    val = np.zeros((ndev, T * th, LANES), dtype=np.float32)
    lcol = np.zeros((ndev, T * th, LANES), dtype=np.int16)
    wrow = np.zeros((ndev, T * ns), dtype=np.int32)
    obase = np.zeros((ndev, T * ns), dtype=np.int32)
    for d, l in enumerate(lays):
        val[d, : l.val.shape[0]] = l.val
        lcol[d, : l.lcol.shape[0]] = l.lcol
        wrow[d, : l.round_wrow.shape[0]] = l.round_wrow
        obase[d, : l.round_obase.shape[0]] = l.round_obase

    return StackedWSell(
        ndev=ndev, th=th, sub=sub, nwin=nwin, wgroup=wgroup,
        num_tiles=T, y_rows=y_rows, x2d_rows=x2d_rows, n_pad=n_pad,
        val=val, lcol=lcol, wrow=wrow, obase=obase, fill=fill,
        bytes_per_iter=T * th * LANES * (4 + 2) + T * ns * 8,
    )


def hub_stack_pseg(a: CSR, row_starts: list[int], n_pad: int, *,
                   min_fill: float, th: int = 256):
    """Global hub relabel + row re-partition + stack (shared by the 1D
    dist SpMV and SpMM plans). Returns (StackedPSeg, colperm)."""
    pop = np.bincount(a.indices, minlength=a.shape[1])
    colperm = np.argsort(-pop, kind="stable").astype(np.int64)
    s = a.to_scipy().tocsr()[:, colperm].tocsr()
    s.sort_indices()
    ap = CSR.from_scipy(s).astype(a.dtype)
    parts_p = [
        CSR.from_scipy(s[row_starts[d]:row_starts[d + 1]])
        for d in range(len(row_starts) - 1)
    ]
    st = stack_pseg(ap, parts_p, row_starts, n_pad, th=th,
                    min_fill=min_fill)
    return st, colperm


@dataclasses.dataclass(frozen=True, eq=False)
class StackedPSeg:
    ndev: int
    th: int
    num_tiles: int
    y_rows: int           # per-chip PSEG y2d rows (max over chips)
    x2d_rows: int
    n_pad: int
    val: np.ndarray       # (ndev, T*th, 128)
    lcol: np.ndarray      # (ndev, T*th, 128) int16
    tsb: np.ndarray       # (ndev, T*th, 128) int16
    wrow: np.ndarray      # (ndev, T*th/8) int32
    oblk: np.ndarray      # (ndev, T*th/8) int32
    s_rows: np.ndarray    # (ndev, S) int32  local y-flat index (pad: 0)
    s_cols: np.ndarray    # (ndev, S) int32  relabeled global column
    s_vals: np.ndarray    # (ndev, S) f32    (pad: 0)
    colperm: np.ndarray   # (n,) global column relabeling
    rowperm_inv: np.ndarray  # (m,) original row -> stacked y-flat position
    fill: float
    bytes_per_iter: int


def stack_pseg(a: CSR, parts: list[CSR], row_starts: list[int], n_pad: int,
               *, th: int = 256, min_fill: float = 0.25) -> StackedPSeg:
    """Stack per-chip PSEG layouts (scattered/power-law dist fast path).

    Columns are hub-relabeled GLOBALLY (the caller partitions the already
    column-relabeled matrix so shards agree on x ordering); rows are
    degree-sorted per shard. Geometry (tiles, y_rows, straggler count) pads
    to the per-chip max so one pallas_call runs SPMD."""
    from ..retile_pseg import pack_pseg
    from ..formats import CSR as _CSR

    if a.dtype == np.float64:
        raise ValueError("Mosaic has no f64; use the XLA dist path")
    m, n = a.shape
    ndev = len(parts)
    lays = []
    rowperms = []
    for p in parts:
        deg = p.row_lengths
        rp = np.argsort(-deg, kind="stable").astype(np.int64)
        sp_ = p.to_scipy().tocsr()[rp].tocsr()
        sp_.sort_indices()
        lays.append(pack_pseg(_CSR.from_scipy(sp_).astype(a.dtype),
                              th=th, cache=False))
        rowperms.append(rp)

    fill = _pseg_fill_check(lays, min_fill)
    stacked = _stack_pseg_arrays(lays, n_pad, th)

    # original row -> position in the stacked (ndev, y_rows*128) output
    y_rows = stacked["y_rows"]
    rowperm_inv = np.empty(m, dtype=np.int64)
    for d in range(ndev):
        r0, r1 = row_starts[d], row_starts[d + 1]
        inv = np.empty(r1 - r0, dtype=np.int64)
        inv[rowperms[d]] = np.arange(r1 - r0)
        rowperm_inv[r0:r1] = d * y_rows * LANES + inv

    return StackedPSeg(
        ndev=ndev, th=th, n_pad=n_pad,
        colperm=np.zeros(0, np.int64),  # caller-owned (global relabeling)
        rowperm_inv=rowperm_inv, fill=fill, **stacked,
    )


def _pseg_fill_check(lays, min_fill: float) -> float:
    kept = sum(l.nnz - l.n_stragglers for l in lays)
    slots = sum(l.val.size for l in lays)
    fill = kept / max(slots, 1)
    if fill < min_fill:
        raise ValueError(
            f"stacked PSEG fill {fill:.2f} below {min_fill}; XLA dist path"
        )
    return fill


def _stack_pseg_arrays(lays, n_pad: int, th: int) -> dict:
    """Pad per-chip PSEG layouts to a common geometry (dict of StackedPSeg
    fields shared by the row-split and nnz-split stackers)."""
    ndev = len(lays)
    T = max(l.num_tiles for l in lays)
    y_rows = max(l.y_rows for l in lays)
    x2d_rows = max(max(l.x2d_rows for l in lays), -(-n_pad // LANES))
    if x2d_rows * LANES * 4 > VMEM_X_LIMIT:
        raise ValueError("gathered x exceeds VMEM staging limit")
    if y_rows * LANES * 4 > VMEM_Y_LIMIT:
        raise ValueError("local y exceeds VMEM accumulator limit")
    S = max(max(l.n_stragglers for l in lays), 1)
    ns = th // SUBLANES

    val = np.zeros((ndev, T * th, LANES), dtype=np.float32)
    lcol = np.zeros((ndev, T * th, LANES), dtype=np.int16)
    tsb = np.zeros((ndev, T * th, LANES), dtype=np.int16)
    wrow = np.zeros((ndev, T * ns), dtype=np.int32)
    oblk = np.zeros((ndev, T * ns), dtype=np.int32)
    s_rows = np.zeros((ndev, S), dtype=np.int32)
    s_cols = np.zeros((ndev, S), dtype=np.int32)
    s_vals = np.zeros((ndev, S), dtype=np.float32)
    for d, l in enumerate(lays):
        val[d, : l.val.shape[0]] = l.val
        lcol[d, : l.lcol.shape[0]] = l.lcol
        tsb[d, : l.tsb.shape[0]] = l.tsb
        wrow[d, : l.round_wrow.shape[0]] = l.round_wrow
        oblk[d, : l.round_oblk.shape[0]] = l.round_oblk
        ns_ = l.n_stragglers
        if ns_:
            s_rows[d, :ns_] = l.s_rows
            s_cols[d, :ns_] = l.s_cols
            s_vals[d, :ns_] = l.s_vals

    return dict(
        num_tiles=T, y_rows=y_rows, x2d_rows=x2d_rows,
        val=val, lcol=lcol, tsb=tsb, wrow=wrow, oblk=oblk,
        s_rows=s_rows, s_cols=s_cols, s_vals=s_vals,
        bytes_per_iter=T * th * LANES * 8 + S * 12,
    )


def hub_stack_pseg_split(a: CSR, ndev: int, n_pad: int, *,
                         min_fill: float, th: int = 256):
    """nnz-split PSEG stacking: hub-relabel columns, degree-sort rows
    GLOBALLY, then cut the permuted nnz stream into equal ranges (rows may be
    cut). Each chip packs its range as a GLOBAL-shape matrix, so every chip's
    y2d lives in the same (permuted) row space — partial products from cut
    rows merge with one psum, exactly like the w-SELL/ELL nnz-split bodies.

    Returns (StackedPSeg, colperm, rowperm_inv) where rowperm_inv maps
    original row -> flat y2d position (PSEG's y2d flattens to permuted row
    order: block*1024 + sublane*128 + lane = row index)."""
    from ..partition import partition_nnz_split
    from ..retile_pseg import pack_pseg
    from ..formats import COO, CSR as _CSR, coo_to_csr

    if a.dtype == np.float64:
        raise ValueError("Mosaic has no f64; use the XLA dist path")
    m, n = a.shape
    pop = np.bincount(a.indices, minlength=n)
    colperm = np.argsort(-pop, kind="stable").astype(np.int64)
    deg = a.row_lengths
    rowperm = np.argsort(-deg, kind="stable").astype(np.int64)
    s = a.to_scipy().tocsr()[rowperm].tocsr()[:, colperm].tocsr()
    s.sort_indices()
    ap = _CSR.from_scipy(s).astype(a.dtype)

    part = partition_nnz_split(ap, ndev)
    lays = []
    for d, p in enumerate(part.parts):
        coo = p.tocoo()
        r0 = int(part.first_row[d])
        pg = coo_to_csr(COO((m, n), coo.row.astype(np.int64) + r0,
                            coo.col, coo.data))
        lays.append(pack_pseg(pg, th=th, cache=False))

    fill = _pseg_fill_check(lays, min_fill)
    stacked = _stack_pseg_arrays(lays, n_pad, th)
    rowperm_inv = np.empty(m, dtype=np.int64)
    rowperm_inv[rowperm] = np.arange(m)

    st = StackedPSeg(
        ndev=ndev, th=th, n_pad=n_pad,
        colperm=np.zeros(0, np.int64),
        rowperm_inv=rowperm_inv, fill=fill, **stacked,
    )
    return st, colperm


def split_2d_blocks(parts, n_chunk: int, ncols: int):
    """Split each row-partition part into ``ncols`` column blocks of width
    ``n_chunk`` with chunk-local column indices (shared by the 2D plans).
    Returns the R*C blocks in row-major (i*C + j) order."""
    from ..formats import COO, coo_to_csr

    blocks = []
    for p in parts:
        coo = p.tocoo()
        for j in range(ncols):
            c0 = j * n_chunk
            sel = (coo.col >= c0) & (coo.col < c0 + n_chunk)
            blocks.append(coo_to_csr(COO(
                (p.shape[0], n_chunk),
                coo.row[sel], coo.col[sel] - c0, coo.data[sel],
            )))
    return blocks


def pallas_spmm_fits(st: StackedWSell, k: int) -> bool:
    """Does a k-column SpMM fit the per-chip VMEM staging/accumulator
    budget for this stacked layout? (shared by the 1D and 2D dist plans)
    Also bounds the kernel's ngrp*k static unroll — past ~512 bodies the
    Mosaic compiler crashes (measured round 3, single-chip K=32)."""
    ngrp = max((st.th // SUBLANES) // st.wgroup, 1)
    return (k * st.x2d_rows * 128 * 4 <= VMEM_X_LIMIT
            and st.y_rows * st.sub * k * 4 <= VMEM_Y_LIMIT
            and ngrp * k <= 512)


def unpad_slots(row_starts: list[int], stride: int) -> np.ndarray:
    """slot[r] = owner_block * stride + offset: the gather map that
    reassembles per-chip padded outputs into original row order."""
    m = int(row_starts[-1])
    slot = np.empty(m, dtype=np.int64)
    for i in range(len(row_starts) - 1):
        r0, r1 = row_starts[i], row_starts[i + 1]
        slot[r0:r1] = i * stride + np.arange(r1 - r0)
    return slot


@dataclasses.dataclass(frozen=True, eq=False)
class StackedBsrT:
    """Per-chip transposed dense-block BSR streams on a common geometry
    (the round-4 single-chip SpMM fast path — e13b: DMA-roofline — run
    SPMD inside the shard_map body)."""
    ndev: int
    tb: int
    num_tiles: int        # common tile count (max over chips)
    num_brows: int        # common per-chip 128-row output blocks
    num_bcols: int        # panels covering n_pad
    at: np.ndarray        # (ndev, T*tb*128, 128) f32 transposed blocks
    brow: np.ndarray      # (ndev, T*tb) int32, chip-local block-row
    bcol: np.ndarray      # (ndev, T*tb) int32
    density: float
    bytes_per_iter: int   # per-chip block-stream bytes


def stack_bsr_t(parts: list[CSR], n_pad: int, dtype, *, tb: int = 16,
                min_density: float = 0.04, k_hint: int = 8) -> StackedBsrT:
    from ..retile_bsr import pack_bsr
    from ..ops.kernels.spmm_bsr_pallas import _VMEM_T_LIMIT

    if dtype == np.float64:
        raise ValueError("Mosaic has no f64; use the XLA dist path")
    num_bcols = -(-n_pad // 128)
    bsrs = [pack_bsr(p, br=128, bc=128) for p in parts]
    total_nnz = sum(b.nnz for b in bsrs)
    total_area = sum(b.nblocks for b in bsrs) * 128 * 128
    density = total_nnz / max(total_area, 1)
    if density < min_density:
        raise ValueError(
            f"aggregate BSR density {density:.3f} below {min_density} "
            "(scattered matrix); use the w-SELL/PSEG dist paths"
        )
    num_brows = max(b.num_brows for b in bsrs)
    kp = -(-k_hint // 8) * 8
    vmem = kp * (num_bcols + num_brows) * 128 * 4
    if vmem > _VMEM_T_LIMIT:
        raise ValueError(
            f"Xt+Yt ({vmem >> 20} MB at k={kp}) exceed the transposed-"
            "kernel VMEM ceiling; use the w-SELL dist path"
        )
    ndev = len(parts)
    T = max(max(-(-b.nblocks // tb) for b in bsrs), 1)
    total = T * tb
    at = np.zeros((ndev, total * 128, 128), np.float32)
    brow = np.zeros((ndev, total), np.int32)
    bcol = np.zeros((ndev, total), np.int32)
    for d, b in enumerate(bsrs):
        nb = b.nblocks
        at[d, : nb * 128] = b.blocks.transpose(0, 2, 1).reshape(nb * 128,
                                                                128)
        brow[d, :nb] = b.brow
        bcol[d, :nb] = b.bcol
        brow[d, nb:] = num_brows - 1   # zero pad blocks -> last slab
    return StackedBsrT(
        ndev=ndev, tb=tb, num_tiles=T, num_brows=num_brows,
        num_bcols=num_bcols, at=at, brow=brow, bcol=bcol, density=density,
        bytes_per_iter=total * 128 * 128 * 4 + total * 8,
    )


def bsrt_spmm_fits(st: StackedBsrT, k: int) -> bool:
    """Per-k VMEM check for the stacked transposed-BSR SpMM body."""
    from ..ops.kernels.spmm_bsr_pallas import _VMEM_T_LIMIT

    kp = -(-k // 8) * 8
    return kp * (st.num_bcols + st.num_brows) * 128 * 4 <= _VMEM_T_LIMIT
