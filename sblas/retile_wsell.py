"""Windowed sliced-ELL (w-SELL v3): the Pallas SpMV layout (SURVEY.md C5
"retile CSR into sliced-ELL/padded-segment layouts in HBM").

Motivating measurements on v5e (experiments/e5):
  - XLA's gather/scatter lowering is serial: COO/ELL jnp paths run at
    ~1 GB/s. A Pallas kernel is the only fast path.
  - A streaming Pallas kernel built on the per-sublane lane-gather
    (`take_along_axis(..., axis=1)`) reaches 659 GB/s = 97.5% of measured
    STREAM — but per-grid-step overhead is ~300-400 ns, so grid steps must
    move >=256 KB to amortize.

Layout. The unit of work is a *round*: an (8 x 128) register tile whose
columns all lie in ONE 128-column panel (``wrow``) and whose rows are the 8
sublanes x ``sub`` lane-segments = ``8*sub`` consecutive matrix rows of one
*row block* (``obase``); row ``obase*8*sub + s*sub + k`` sits at sublane s,
lane block k, with ``lps = 128//sub`` slots. A row's nonzeros are chunked by
(panel, lps) in column order; chunk q of a row goes in its row block's
round q. Rounds are packed densely (no alignment between row blocks) into
physical tiles of (th x 128) — one grid step each; per-round metadata
(wrow, obase) rides in scalar prefetch. Both x (as x2d[*,128]) and the full
y live in VMEM, so rounds can scatter-accumulate anywhere — no group
padding, fill = per-chunk padding only.

Matrices with column locality (FEM suite) pack at fill ~0.8; scattered
matrices shatter into tiny per-panel chunks — callers detect low ``fill``
and fall back (SpmvPlan auto-dispatch).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from .formats import CSR, INDEX_DTYPE

SUBLANES = 8
LANES = 128


@dataclasses.dataclass(frozen=True, eq=False)
class WSell:
    m: int
    n: int
    nnz: int
    th: int             # physical tile height (a multiple of 8)
    sub: int            # row segments per sublane
    nwin: int           # panels per round window (1 or 2)
    wgroup: int         # rounds per shared-window group
    num_tiles: int
    num_rounds: int
    # Per-tile arrays; tile t occupies array rows [t*th, (t+1)*th):
    val: np.ndarray       # (T*th, 128)
    lcol: np.ndarray      # (T*th, 128) int16 in [0, 256); pad slots 0
    round_wrow: np.ndarray   # (T * th/8,) int32 x-window row per round
    round_obase: np.ndarray  # (T * th/8,) int32 row-block index per round
    x2d_rows: int
    y_rows: int           # output buffer rows: ceil(m/sub) padded to 8
    # Blocked-y mode (yblocks > 0): y2d is split into num_yblks blocks of
    # yb_rows rows; rounds are sorted y-block-major, every tile's rounds
    # stay within ONE y block, and round_obase is LOCAL to the tile's
    # block. tile_yblk/tile_first drive the out BlockSpec index_map and
    # the per-block zeroing. yblocks == 0 keeps the whole-y layout
    # (tile_yblk/tile_first are None).
    tile_yblk: np.ndarray | None = None   # (T,) y-block of each tile
    tile_first: np.ndarray | None = None  # (T,) 1 = first tile of its blk
    num_yblks: int = 1
    yb_rows: int = 0

    @property
    def rows_per_block(self) -> int:
        return SUBLANES * self.sub

    @property
    def rounds_per_tile(self) -> int:
        return self.th // SUBLANES

    @property
    def fill(self) -> float:
        return self.nnz / max(self.val.size, 1)

    @property
    def bytes_per_iter(self) -> int:
        return (self.val.size * (self.val.itemsize + self.lcol.itemsize)
                + self.round_wrow.size * 8)


def _chunk_stats(a: CSR, lps: int) -> Tuple[int, int]:
    """(total rounds needed, total slot count) for chunking by (panel, lps)."""
    rows = a.row_ids().astype(np.int64)
    panels = a.indices.astype(np.int64) // LANES
    npan = int(panels.max(initial=0)) + 1
    key = rows * npan + panels
    uniq, counts = np.unique(key, return_counts=True)
    chunks = -(-counts // lps)
    # rounds per row block = max over rows in block of per-row chunk count
    row_chunks = np.zeros(a.shape[0], dtype=np.int64)
    np.add.at(row_chunks, (uniq // npan).astype(np.int64), chunks)
    return int(chunks.sum()), int(chunks.sum()) * lps


def pick_sub(a: CSR) -> int:
    """Minimize streamed slots: sum over (row, panel) of ceil(c/lps)*lps,
    but a row block's rounds hold ALL its rows' q-th chunks, so the real
    round count is driven by the max-chunks row in each 8*sub block; estimate
    both and take the better balance."""
    m = a.shape[0]
    rows = a.row_ids().astype(np.int64)
    panels = a.indices.astype(np.int64) // LANES
    npan = int(panels.max(initial=0)) + 1
    key = rows * npan + panels
    uniq, counts = np.unique(key, return_counts=True)
    urows = (uniq // npan).astype(np.int64)
    best, best_sub = None, 1
    for sub in (1, 2, 4, 8, 16):
        lps = LANES // sub
        chunks = -(-counts // lps)
        per_row = np.zeros(m, dtype=np.int64)
        np.add.at(per_row, urows, chunks)
        rpb = SUBLANES * sub
        pad = (-m) % rpb
        pr = np.concatenate([per_row, np.zeros(pad, np.int64)]) if pad else per_row
        rounds = int(pr.reshape(-1, rpb).max(axis=1).sum())
        cost = rounds  # each round streams 8*128 slots
        if best is None or cost < best:
            best, best_sub = cost, sub
    return best_sub


def estimate_rounds(a: CSR, sub: int) -> int:
    """Round-count estimate for a given ``sub`` (same block-max formula as
    pick_sub) — cheap numpy probe used to refuse shattered packings BEFORE
    the round builder allocates them."""
    m = a.shape[0]
    lps = LANES // sub
    rows = a.row_ids().astype(np.int64)
    panels = a.indices.astype(np.int64) // LANES
    npan = int(panels.max(initial=0)) + 1
    key = rows * npan + panels
    uniq, counts = np.unique(key, return_counts=True)
    chunks = -(-counts // lps)
    per_row = np.zeros(m, dtype=np.int64)
    np.add.at(per_row, (uniq // npan).astype(np.int64), chunks)
    rpb = SUBLANES * sub
    pad = (-m) % rpb
    pr = np.concatenate([per_row, np.zeros(pad, np.int64)]) if pad else per_row
    return int(pr.reshape(-1, rpb).max(axis=1).sum())


def check_shattered(rounds: int, nnz: int, what: str = "w-SELL"):
    """Raise when a projected packing is both huge (> 1 GiB of slots) and
    pathologically empty (< 5% fill): powerlaw-1M measured 63M rounds =
    a 241 GiB schedule allocation. Legit packs keep fill >= ~0.2."""
    if (rounds * SUBLANES * LANES * 4 > 1 << 30
            and nnz < 0.05 * rounds * SUBLANES * LANES):
        raise ValueError(
            f"{what} shattered: {rounds} rounds for {nnz} nnz "
            f"(fill {nnz / max(rounds * 1024, 1):.4f}); scattered columns"
        )


def _finalize_rounds(val, lcol, wrow, obase, *, m, n, nnz, dtype,
                     th, sub, nwin, wgroup, yblocks: int = 0):
    """Sort rounds by (y-block, window), pad window runs to wgroup, pad each
    y-block to whole tiles, and assemble the WSell container. val/lcol are
    (R*8, 128).

    ``yblocks`` > 0 enables the blocked-y layout: ``yblocks`` row blocks
    (8 y2d rows each) per y block, so the kernel can keep only one y block
    resident in VMEM (m beyond ~262K rows otherwise lane-pads y past the
    VMEM budget). Rounds become y-block-major, obase turns block-local, and
    each tile's rounds stay inside one y block."""
    R = len(wrow)
    nblocks = -(-max(m, 1) // (SUBLANES * sub))
    B = yblocks if yblocks > 0 else nblocks  # blocks per y block
    yblk = obase // B
    order = np.lexsort((obase, wrow, yblk))
    yb_s = yblk[order]
    wrow_s = wrow[order]
    num_yblks = -(-nblocks // B)
    # window runs are per (y block, window)
    runkey = yb_s * (int(wrow_s.max(initial=0)) + 2) + wrow_s
    uniq_idx = np.concatenate([[True], runkey[1:] != runkey[:-1]])
    starts = np.flatnonzero(uniq_idx)
    counts = np.diff(np.concatenate([starts, [R]]))
    padded = ((counts + wgroup - 1) // wgroup) * wgroup
    R2 = int(padded.sum())
    if th <= 0:
        # adaptive tile height: target ~16 grid steps (round-3 e10c: bigger
        # tiles amortize the ~350 ns step overhead — th=4096 beat th=1024
        # by 10 us on cant — but a fixed 4096 would pad tiny matrices 5x).
        ns_t = -(-max(R2, 1) // 16)
        ns_t = min(4096 // SUBLANES, max(256 // SUBLANES, ns_t))
        th = (-(-ns_t // wgroup) * wgroup) * SUBLANES
    ns = max(th // SUBLANES, 1)

    # per-run y block and padded rounds per y block
    run_yb = yb_s[starts]
    yb_rounds = np.zeros(num_yblks, dtype=np.int64)
    np.add.at(yb_rounds, run_yb, padded)
    # each y block pads to whole tiles so a tile never straddles blocks;
    # even an EMPTY y block gets one all-pad tile — its first tile is what
    # zeroes the output block in VMEM (an unvisited block would return
    # garbage for its rows)
    yb_tiles = np.maximum(-(-yb_rounds // ns), 1)
    T = int(yb_tiles.sum())
    total = T * ns
    yb_round_total = yb_tiles * ns
    yb_base = np.concatenate([[0], np.cumsum(yb_round_total)[:-1]])

    # Shatter guard BEFORE allocating: a scattered matrix (each nnz its own
    # (row, panel) chunk) projects ~one round per nnz — powerlaw-1M
    # measured 63M rounds = a 241 GiB val2. Legit packs keep fill >= ~0.2;
    # refuse when the projection is both huge and pathologically empty so
    # SpmvPlan's auto chain falls through to PSEG/XLA.
    total_proj = int(yb_tiles.sum()) * ns
    if (total_proj * SUBLANES * LANES * 4 > 1 << 30
            and nnz < 0.05 * total_proj * SUBLANES * LANES):
        raise ValueError(
            f"w-SELL shattered: {total_proj} rounds for {nnz} nnz "
            f"(fill {nnz / (total_proj * 1024):.4f}); scattered columns"
        )

    # destination slot of each sorted round: y-block base + padded-run base
    # within the block + position within the run (runs are (yb, wrow)-sorted
    # so the padded cumsum resets cleanly at each y-block boundary)
    cp = np.concatenate([[0], np.cumsum(padded)[:-1]])
    yb_run_first = np.concatenate(
        [[True], run_yb[1:] != run_yb[:-1]]) if len(run_yb) else np.zeros(
        0, bool)
    run_base_in_yb = cp - np.repeat(cp[np.flatnonzero(yb_run_first)],
                                    np.diff(np.concatenate(
                                        [np.flatnonzero(yb_run_first),
                                         [len(run_yb)]])))
    run_start_global = yb_base[run_yb] + run_base_in_yb
    within = np.arange(R) - np.repeat(starts, counts)
    dest = np.repeat(run_start_global, counts) + within

    val2 = np.zeros((total * SUBLANES, LANES), dtype=dtype)
    # lcol in [0, 256) -> int16 halves index stream bytes (DESIGN.md)
    lcol2 = np.zeros((total * SUBLANES, LANES), dtype=np.int16)
    wrow2 = np.zeros(total, dtype=np.int64)
    obase2 = np.zeros(total, dtype=np.int64)
    # window of pad slots within a run must match the run's window
    run_wrow = wrow_s[starts]
    pad_dest = np.repeat(run_start_global, padded) + np.concatenate(
        [np.arange(p) for p in padded]) if len(padded) else np.zeros(0, np.int64)
    wrow2[pad_dest] = np.repeat(run_wrow, padded)
    src_rows = (order[:, None] * SUBLANES + np.arange(SUBLANES)).reshape(-1)
    dst_rows = (dest[:, None] * SUBLANES + np.arange(SUBLANES)).reshape(-1)
    val2[dst_rows] = val[src_rows]
    lcol2[dst_rows] = lcol[src_rows]
    obase2[dest] = obase[order] - (yblk[order] * B if yblocks > 0 else 0)

    tile_yblk = None
    tile_first = None
    yb_rows = 0
    if yblocks > 0:
        # tile-tail pad rounds (between a block's padded runs and its whole-
        # tile boundary) default to wrow 0; point them at the block's LAST
        # real window instead so a per-block x-window [min(wrow), max(wrow)+
        # nwin) stays tight — the windowed-x SpMM mode slices x per block
        # from that span (pad rounds are all-zero val, any in-range window
        # is correct).
        for g in range(num_yblks):
            b0 = int(yb_base[g])
            nreal = int(yb_rounds[g])
            btot = int(yb_round_total[g])
            if 0 < nreal < btot:
                wrow2[b0 + nreal: b0 + btot] = wrow2[b0 + nreal - 1]
        tile_yblk = np.repeat(np.arange(num_yblks, dtype=np.int64), yb_tiles)
        tile_first = np.zeros(T, dtype=np.int64)
        tile_first[np.concatenate([[0], np.cumsum(yb_tiles)[:-1]])] = 1
        tile_yblk = tile_yblk.astype(INDEX_DTYPE)
        tile_first = tile_first.astype(INDEX_DTYPE)
        yb_rows = B * SUBLANES
    return WSell(
        m=m, n=n, nnz=nnz, th=ns * SUBLANES, sub=sub, nwin=nwin,
        wgroup=wgroup, num_tiles=T, num_rounds=R2,
        val=val2, lcol=lcol2,
        round_wrow=wrow2.astype(INDEX_DTYPE),
        round_obase=obase2.astype(INDEX_DTYPE),
        x2d_rows=-(-n // 128) + 1,
        y_rows=((-(-max(m, 1) // (SUBLANES * sub))) * SUBLANES),
        tile_yblk=tile_yblk, tile_first=tile_first,
        num_yblks=(int(num_yblks) if yblocks > 0 else 1), yb_rows=yb_rows,
    )


def pack_wsell(a: CSR, *, th: int = 0, sub: int = 0, nwin: int = 2,
               wgroup: int = 8, yblocks: int = 0,
               cache: bool = True) -> WSell:
    """Pack a CSR matrix into w-SELL v3 tiles.

    ``th`` <= 0 picks the tile height adaptively (~16 grid steps, clamped
    to [256, 4096] rows; see _finalize_rounds).

    ``nwin`` (1 or 2): panels per round window. With 2, a round admits rows
    whose next chunk sits in panel w or w+1 (lcol in [0, 256)), roughly
    halving round count on FEM bands whose rows sit at staggered panel
    offsets, at the cost of a second gather + select in the kernel.

    ``yblocks`` > 0: blocked-y layout (see _finalize_rounds) for matrices
    whose full y would not fit VMEM; the value is row blocks (8*sub rows)
    per resident y block.

    Large matrices' packings persist across runs via plan_cache (keyed by
    matrix digest + params); pass ``cache=False`` to force a repack.
    """
    from . import plan_cache

    if (cache and plan_cache.cache_enabled()
            and a.nnz >= plan_cache.MIN_CACHE_NNZ):
        params = {"th": th, "sub": sub, "nwin": nwin, "wgroup": wgroup,
                  "yblk": yblocks, "v": 4}

        def build():
            w = _pack_wsell_impl(a, th=th, sub=sub, nwin=nwin, wgroup=wgroup,
                                 yblocks=yblocks)
            return {
                "val": w.val, "lcol": w.lcol, "wrow": w.round_wrow,
                "obase": w.round_obase,
                "tyb": (w.tile_yblk if w.tile_yblk is not None
                        else np.zeros(0, INDEX_DTYPE)),
                "tfs": (w.tile_first if w.tile_first is not None
                        else np.zeros(0, INDEX_DTYPE)),
                "meta": np.array([w.m, w.n, w.nnz, w.th, w.sub, w.nwin,
                                  w.wgroup, w.num_tiles, w.num_rounds,
                                  w.x2d_rows, w.y_rows, w.num_yblks,
                                  w.yb_rows], dtype=np.int64),
            }

        d = plan_cache.cached_arrays(a, "wsell", params, build)
        mt = d["meta"]
        blocked = len(d["tyb"]) > 0
        return WSell(
            m=int(mt[0]), n=int(mt[1]), nnz=int(mt[2]), th=int(mt[3]),
            sub=int(mt[4]), nwin=int(mt[5]), wgroup=int(mt[6]),
            num_tiles=int(mt[7]), num_rounds=int(mt[8]),
            val=d["val"], lcol=d["lcol"], round_wrow=d["wrow"],
            round_obase=d["obase"],
            x2d_rows=int(mt[9]), y_rows=int(mt[10]),
            tile_yblk=d["tyb"] if blocked else None,
            tile_first=d["tfs"] if blocked else None,
            num_yblks=int(mt[11]), yb_rows=int(mt[12]),
        )
    return _pack_wsell_impl(a, th=th, sub=sub, nwin=nwin, wgroup=wgroup,
                            yblocks=yblocks)


def _pack_wsell_impl(a: CSR, *, th: int, sub: int, nwin: int,
                     wgroup: int, yblocks: int = 0) -> WSell:
    m, n = a.shape
    if sub <= 0:
        sub = pick_sub(a)
    if sub > 128 or 128 % sub:
        # both packers assume lps = 128/sub integral; the native one also
        # sizes its cursor buffers from it (sub=32 segfaulted before the
        # bound was raised + checked — e35)
        raise ValueError(f"w-SELL: sub={sub} must divide 128")
    # refuse shattered packings BEFORE the round builder sizes its output
    # from the chunk count (powerlaw-1M: 63M rounds = 258 GiB right here)
    check_shattered(estimate_rounds(a, sub), a.nnz)
    if a.data.dtype == np.float32:
        from . import native

        packed = native.pack_wsell_rounds_f32(
            a.indptr, a.indices, a.data, m, sub, nwin
        )
        if packed is not None:
            R, val, lcol, wrow, obase = packed
            if R == 0:
                val = np.zeros((SUBLANES, LANES), np.float32)
                lcol = np.zeros((SUBLANES, LANES), np.int32)
                wrow = np.zeros(1, np.int32)
                obase = np.zeros(1, np.int32)
            return _finalize_rounds(
                val, lcol, wrow.astype(np.int64), obase.astype(np.int64),
                m=m, n=n, nnz=a.nnz, dtype=a.data.dtype,
                th=th, sub=sub, nwin=nwin, wgroup=wgroup, yblocks=yblocks,
            )
    lps = LANES // sub
    rpb = SUBLANES * sub          # rows per block
    nblocks = -(-max(m, 1) // rpb)
    ns = max(th // SUBLANES, 1)
    indptr = a.indptr.astype(np.int64)
    cols = a.indices.astype(np.int64)
    data = a.data

    rounds = []  # (wrow, obase, vt(8,128), ct(8,128))
    for blk in range(nblocks):
        r0 = blk * rpb
        r1 = min(r0 + rpb, m)
        # per-row chunk queues
        row_chunks = []
        for rl in range(r1 - r0):
            r = r0 + rl
            p0, p1 = indptr[r], indptr[r + 1]
            if p1 <= p0:
                continue
            c = cols[p0:p1]
            v = data[p0:p1]
            pan = c // LANES
            chunks = []
            i = 0
            L = len(c)
            while i < L:
                p = pan[i]
                j = i + 1
                while j < L and pan[j] == p and j - i < lps:
                    j += 1
                chunks.append((int(p), v[i:j], c[i:j] - p * LANES))
                i = j
            row_chunks.append((rl, chunks))
        if not row_chunks:
            continue
        nexts = {rl: 0 for rl, _ in row_chunks}
        chmap = dict(row_chunks)
        while True:
            pending = [(chmap[rl][nexts[rl]][0], rl) for rl in nexts
                       if nexts[rl] < len(chmap[rl])]
            if not pending:
                break
            wsel = min(p for p, _ in pending)
            vt = np.zeros((SUBLANES, LANES), dtype=data.dtype)
            ct = np.zeros((SUBLANES, LANES), dtype=np.int64)
            for p, rl in pending:
                if p <= wsel + nwin - 1:
                    _, v, lc = chmap[rl][nexts[rl]]
                    s, k = divmod(rl, sub)
                    vt[s, k * lps: k * lps + len(v)] = v
                    ct[s, k * lps: k * lps + len(lc)] = lc + (p - wsel) * LANES
                    nexts[rl] += 1
            rounds.append((wsel, blk, vt, ct))

    if not rounds:
        rounds.append((0, 0, np.zeros((SUBLANES, LANES), dtype=data.dtype),
                       np.zeros((SUBLANES, LANES), dtype=np.int64)))
    R = len(rounds)
    val = np.concatenate([r[2] for r in rounds], axis=0)
    lcol = np.concatenate([r[3] for r in rounds], axis=0).astype(np.int32)
    wrow = np.asarray([r[0] for r in rounds], dtype=np.int64)
    obase = np.asarray([r[1] for r in rounds], dtype=np.int64)
    return _finalize_rounds(val, lcol, wrow, obase, m=m, n=n, nnz=a.nnz,
                            dtype=data.dtype, th=th, sub=sub, nwin=nwin,
                            wgroup=wgroup, yblocks=yblocks)


def wsell_to_dense(w: WSell) -> np.ndarray:
    """Reconstruct the dense matrix from a w-SELL packing (test helper)."""
    out = np.zeros((w.m, w.n), dtype=np.float64)
    lps = LANES // w.sub
    rpt = w.rounds_per_tile
    # iterate ALL physical round slots: in blocked-y mode real rounds sit
    # at per-y-block bases beyond num_rounds; pad slots have zero vals
    for i in range(len(w.round_wrow)):
        wbase = int(w.round_wrow[i]) * LANES
        blk = int(w.round_obase[i])
        if w.tile_yblk is not None:
            # blocked-y: obase is local to the round's tile's y block
            blk += int(w.tile_yblk[i // rpt]) * (w.yb_rows // SUBLANES)
        for s in range(SUBLANES):
            arow = i * SUBLANES + s
            for j in range(LANES):
                v = w.val[arow, j]
                if v != 0.0:
                    k = j // lps
                    row = blk * w.rows_per_block + s * w.sub + k
                    out[row, wbase + int(w.lcol[arow, j])] += v
    return out.astype(w.val.dtype)


def pack_efficiency_report(w: WSell) -> dict:
    return {
        "th": w.th,
        "sub": w.sub,
        "nwin": w.nwin,
        "fill": w.fill,
        "tiles": w.num_tiles,
        "rounds": w.num_rounds,
        "bytes_per_nnz": w.bytes_per_iter / max(w.nnz, 1),
    }
