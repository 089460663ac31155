"""Windowed sliced-ELL (w-SELL): the Pallas SpMV/SpMM layout (SURVEY.md C5
"retile CSR into sliced-ELL/padded-segment layouts in HBM").

Geometry. Tiles are physical (8 sublanes x 128 lanes) vector registers. Each
sublane is split into ``sub`` segments of ``128//sub`` lanes; a tile
therefore feeds ``8*sub`` consecutive rows, with row ``r0 + s*sub + k``
occupying sublane ``s``, lane block ``k``. ``sub`` adapts the slot count per
row to the matrix's average degree (narrow bands -> sub=8 -> 16 slots/row),
keeping fill high without leaving the hardware's (8,128) tile shape.

Every tile carries a *window base* w: all columns in the tile lie in
``[128*w, 128*(w + pmax))`` — at most ``pmax`` consecutive 128-column panels.
The kernel stages x in VMEM as ``x2d[ceil(n/128), 128]``; a tile's gather is
pmax per-sublane lane-gathers (`take_along_axis(..., axis=1)` — the one
gather form Mosaic v5e supports) against broadcast rows of x2d, masked by
panel. Rows longer than a tile's slots, or spanning more than pmax panels,
continue into follow-up tiles of the same row group (``tile_first`` marks
accumulation starts).

Matrices with column locality (the FEM SuiteSparse suite) pack densely with
pmax 2-4. Scattered matrices (power-law graphs) explode into near-empty
tiles — callers detect low ``fill`` and fall back to the XLA bucket path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .formats import CSR, INDEX_DTYPE

SUBLANES = 8
LANES = 128


@dataclasses.dataclass(frozen=True, eq=False)
class WSell:
    m: int
    n: int
    nnz: int
    sub: int            # row segments per sublane
    pmax: int           # panels per tile window
    num_tiles: int
    num_groups: int     # row groups (m padded to 8*sub)
    # Per-tile arrays, tile t occupies array rows [t*8, (t+1)*8):
    val: np.ndarray     # (T*8, 128)
    lcol: np.ndarray    # (T*8, 128) int32 in [0, pmax*128); pad slots 0
    tile_group: np.ndarray  # (T,) int32: row group this tile feeds
    tile_wrow: np.ndarray   # (T,) int32: window base row into x2d
    tile_first: np.ndarray  # (T,) int32: 1 if first tile of its group
    x2d_rows: int       # ceil(n/128) + pmax guard rows

    @property
    def rows_per_tile(self) -> int:
        return SUBLANES * self.sub

    @property
    def fill(self) -> float:
        return self.nnz / max(self.val.size, 1)

    @property
    def bytes_per_iter(self) -> int:
        return self.val.size * (self.val.itemsize + self.lcol.itemsize)


def pick_sub(a: CSR) -> int:
    """Pick the segmentation that minimizes estimated streamed tiles.

    For each candidate sub, a row of degree d needs ceil(d / (128/sub))
    segments and a group of 8*sub rows needs max-over-rows segments worth of
    tiles (window splits ignored — they affect all subs similarly)."""
    deg = a.row_lengths.astype(np.int64)
    m = len(deg)
    if m == 0:
        return 1
    best_sub, best_cost = 1, float("inf")
    for sub in (1, 2, 4, 8, 16):
        lps = LANES // sub
        rpt = SUBLANES * sub
        chunks = -(-deg // lps)
        pad = (-m) % rpt
        if pad:
            chunks = np.concatenate([chunks, np.zeros(pad, np.int64)])
        tiles = np.maximum(chunks.reshape(-1, rpt).max(axis=1), 1).sum()
        if tiles < best_cost:
            best_sub, best_cost = sub, tiles
    return best_sub


def pack_wsell(a: CSR, *, sub: int = 0, pmax: int = 4) -> WSell:
    """Pack a CSR matrix into w-SELL tiles.

    Greedy per row group: repeatedly pick the panel of the smallest
    unconsumed column among the group's rows, then give every row up to its
    segment's slot count of its next nnz that fall inside that window.
    """
    m, n = a.shape
    if sub <= 0:
        sub = pick_sub(a)
    rpt = SUBLANES * sub       # rows per tile
    lps = LANES // sub         # lanes (slots) per row segment
    ngroups = -(-max(m, 1) // rpt)
    indptr = a.indptr.astype(np.int64)
    cols = a.indices.astype(np.int64)
    data = a.data
    span = pmax * 128

    val_tiles, col_tiles = [], []
    tile_group, tile_wrow, tile_first = [], [], []

    for g in range(ngroups):
        r0 = g * rpt
        r1 = min(r0 + rpt, m)
        nr = r1 - r0
        pos = indptr[r0:r1].copy()
        end = indptr[r0 + 1: r1 + 1].copy()
        first = True
        while True:
            active = pos < end
            if not active.any():
                break
            wlo = int(cols[pos[active]].min())
            w = wlo // 128
            hi = w * 128 + span
            vt = np.zeros((SUBLANES, LANES), dtype=data.dtype)
            ct = np.zeros((SUBLANES, LANES), dtype=np.int64)
            for rl in range(nr):
                if pos[rl] >= end[rl]:
                    continue
                stop = int(np.searchsorted(cols[pos[rl]: end[rl]], hi)) + pos[rl]
                take = min(stop - pos[rl], lps)
                if take > 0:
                    s, k = divmod(rl, sub)
                    sl = slice(pos[rl], pos[rl] + take)
                    vt[s, k * lps: k * lps + take] = data[sl]
                    ct[s, k * lps: k * lps + take] = cols[sl] - w * 128
                    pos[rl] += take
            val_tiles.append(vt)
            col_tiles.append(ct)
            tile_group.append(g)
            tile_wrow.append(w)
            tile_first.append(1 if first else 0)
            first = False
        if first:
            val_tiles.append(np.zeros((SUBLANES, LANES), dtype=data.dtype))
            col_tiles.append(np.zeros((SUBLANES, LANES), dtype=np.int64))
            tile_group.append(g)
            tile_wrow.append(0)
            tile_first.append(1)

    T = len(val_tiles)
    return WSell(
        m=m, n=n, nnz=a.nnz, sub=sub, pmax=pmax, num_tiles=T,
        num_groups=ngroups,
        val=np.concatenate(val_tiles, axis=0),
        lcol=np.concatenate(col_tiles, axis=0).astype(INDEX_DTYPE),
        tile_group=np.asarray(tile_group, dtype=INDEX_DTYPE),
        tile_wrow=np.asarray(tile_wrow, dtype=INDEX_DTYPE),
        tile_first=np.asarray(tile_first, dtype=INDEX_DTYPE),
        x2d_rows=-(-n // 128) + pmax,
    )


def wsell_to_dense(w: WSell) -> np.ndarray:
    """Reconstruct the dense matrix from a w-SELL packing (test helper)."""
    out = np.zeros((w.m, w.n), dtype=np.float64)
    lps = LANES // w.sub
    for t in range(w.num_tiles):
        g = int(w.tile_group[t])
        wbase = int(w.tile_wrow[t]) * 128
        for s in range(SUBLANES):
            for j in range(LANES):
                v = w.val[t * SUBLANES + s, j]
                if v != 0.0:
                    k = j // lps
                    row = g * w.rows_per_tile + s * w.sub + k
                    out[row, wbase + int(w.lcol[t * SUBLANES + s, j])] += v
    return out.astype(w.val.dtype)


def pack_efficiency_report(w: WSell) -> dict:
    return {
        "sub": w.sub,
        "fill": w.fill,
        "tiles": w.num_tiles,
        "tiles_per_group": w.num_tiles / max(w.num_groups, 1),
        "bytes_per_nnz": w.bytes_per_iter / max(w.nnz, 1),
    }
