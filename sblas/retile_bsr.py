"""Dense-block BSR retiling: sparse matrix as a list of dense (R x 128)
blocks (SURVEY.md C5/C6 "padded-segment" alternative).

TPU rationale: the MXU consumes dense (128,128) tiles natively, and XLA's
row-gather of contiguous (128, k) X panels is efficient — so for matrices
whose nonzeros cluster into panels (FEM suite), storing touched panels
*dense* removes the irregular gather entirely:

    Y = segment_sum_over_block_rows( A_blocks @ X[block_col] )

Traffic is block_bytes = dense panels; worthwhile when block density (nnz /
touched-panel area) is above ~15-25%. The planner reports density so callers
can fall back to ELL/w-SELL for scattered matrices.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .formats import CSR, INDEX_DTYPE


@dataclasses.dataclass(frozen=True, eq=False)
class BsrBlocks:
    m: int
    n: int
    nnz: int
    br: int  # block rows (sublane dim)
    bc: int  # block cols (lane dim)
    nblocks: int
    blocks: np.ndarray   # (nblocks, br, bc) dense values
    brow: np.ndarray     # (nblocks,) block-row index (sorted)
    bcol: np.ndarray     # (nblocks,) block-col index
    num_brows: int
    num_bcols: int

    @property
    def density(self) -> float:
        return self.nnz / max(self.blocks.size, 1)

    @property
    def bytes_per_iter(self) -> int:
        return self.blocks.size * self.blocks.itemsize + self.nblocks * 8


def bsr_stats(a: CSR, *, br: int = 128, bc: int = 128) -> dict:
    """Block count/density WITHOUT allocating the dense blocks (cheap probe
    for method auto-selection; dense packing of a scattered matrix would
    explode memory)."""
    m, n = a.shape
    num_bcols = -(-max(n, 1) // bc)
    rows = a.row_ids().astype(np.int64)
    cols = a.indices.astype(np.int64)
    bid = (rows // br) * num_bcols + (cols // bc)
    nblocks = len(np.unique(bid))
    area = max(nblocks, 1) * br * bc
    return {"nblocks": nblocks, "density": a.nnz / area,
            "bytes": area * a.data.itemsize}


def pack_bsr(a: CSR, *, br: int = 128, bc: int = 128,
             cache: bool = True) -> BsrBlocks:
    """Dense-block pack. Large packings persist via plan_cache (mmap .npy):
    fem-band-1M's 12 GiB block plan costs ~750 s to build host-side and is
    shared by every k (the k-aware dense routing makes it the large-FEM
    SpMM default — e30)."""
    from . import plan_cache

    m, n = a.shape
    if (cache and plan_cache.cache_enabled()
            and a.nnz >= 8 * plan_cache.MIN_CACHE_NNZ):
        params = {"br": br, "bc": bc, "v": 1}

        def build():
            b = _pack_bsr_impl(a, br=br, bc=bc)
            return {"blocks": b.blocks, "brow": b.brow, "bcol": b.bcol,
                    "meta": np.array([b.m, b.n, b.nnz, b.nblocks,
                                      b.num_brows, b.num_bcols],
                                     dtype=np.int64)}

        d = plan_cache.cached_arrays(a, "bsr", params, build)
        mt = d["meta"]
        return BsrBlocks(int(mt[0]), int(mt[1]), int(mt[2]), br, bc,
                         int(mt[3]), d["blocks"], d["brow"], d["bcol"],
                         int(mt[4]), int(mt[5]))
    return _pack_bsr_impl(a, br=br, bc=bc)


def _pack_bsr_impl(a: CSR, *, br: int, bc: int) -> BsrBlocks:
    m, n = a.shape
    num_brows = -(-max(m, 1) // br)
    num_bcols = -(-max(n, 1) // bc)
    rows = a.row_ids().astype(np.int64)
    cols = a.indices.astype(np.int64)
    bid = (rows // br) * num_bcols + (cols // bc)
    uniq, inv = np.unique(bid, return_inverse=True)
    nblocks = len(uniq)
    blocks = np.zeros((max(nblocks, 1), br, bc), dtype=a.data.dtype)
    np.add.at(blocks, (inv, rows % br, cols % bc), a.data)
    brow = (uniq // num_bcols).astype(INDEX_DTYPE)
    bcol = (uniq % num_bcols).astype(INDEX_DTYPE)
    if nblocks == 0:
        brow = np.zeros(1, INDEX_DTYPE)
        bcol = np.zeros(1, INDEX_DTYPE)
        nblocks = 1
    return BsrBlocks(m, n, a.nnz, br, bc, nblocks, blocks, brow, bcol,
                     num_brows, num_bcols)
