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
