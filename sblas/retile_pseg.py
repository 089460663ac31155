"""Packed-segment (PSEG) layout: the scattered/power-law SpMV fast path
(SURVEY.md C5 "padded-segment" and §7 hard-part 4; VERDICT r1 item 6).

Why w-SELL fails on graphs: it charges every row at least one lps-slot
chunk per touched panel, so a deg-1 row costs 8 slots — power-law matrices
(many deg-1..4 rows, a few huge hubs) pack at fill ~0.01.

PSEG removes the per-row slot floor by encoding the TARGET position in the
data stream instead of the layout geometry:

- rows are grouped in blocks of 1024 = 8 target-sublanes x 128 lanes;
  row r of a block lives at y2d[block*8 + ts, tl] with tl = (r%1024) % 128,
  ts = (r%1024) // 128;
- a round is an (8 x 128) nnz tile with a 2-panel x window (like w-SELL):
  the nnz at (s, l) MUST target lane l of the round's block (its row's tl),
  may sit in any source sublane s (8 slots per lane per round), and carries
  its target sublane ts in a third int16 plane (``tsb``);
- the kernel gathers x, multiplies, then forms the (8,128) output block by
  8 masked sublane-reductions (sum_s p[s,l] * [tsb[s,l]==ts]) — a pure
  VPU scatter that costs ~25 ops/slot, far below the bandwidth bound.

Fill = nnz per (block, lane, window) / 8-slot granularity: a lane covers 8
rows, so low-degree rows share slots — the floor drops from lps per row to
1 per nnz. Column locality is still required (the 2-panel window); the
caller provides it for power-law inputs via column-popularity relabeling
(hot hub columns -> panel 0), see ops/kernels/spmv_pseg.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .formats import CSR, INDEX_DTYPE

SUBLANES = 8
LANES = 128
BLOCK_ROWS = SUBLANES * LANES  # 1024
HUB_PANELS = 2    # hub-relabeled hot panels served by win2 rounds
TAIL_WIN = 16     # panels per tail window (2 sub-windows of 8, sel bit)


@dataclasses.dataclass(frozen=True, eq=False)
class PSeg:
    m: int
    n: int
    nnz: int
    th: int
    num_tiles: int
    num_rounds: int
    val: np.ndarray        # (T*th, 128) f32
    lcol: np.ndarray       # (T*th, 128) int16 in [0, 256)
    tsb: np.ndarray        # (T*th, 128) int16 in [0, 8); pads have val=0
    round_wrow: np.ndarray   # (T*th/8,) int32
    round_oblk: np.ndarray   # (T*th/8,) int32 (block index; pad rounds -> 0)
    x2d_rows: int
    y_rows: int            # num_blocks * 8
    # straggler nnz (sparse tail rounds diverted to an XLA COO side-path):
    s_rows: np.ndarray     # (S,) int32
    s_cols: np.ndarray     # (S,) int32
    s_vals: np.ndarray     # (S,) f32
    # hybrid packing (pack_pseg_hybrid): rounds [0, n_hub_rounds) are win2
    # hub rounds, the rest are panel-bound TAIL_WIN rounds; -1 = no tail
    # rounds (plain win2 packing)
    n_hub_rounds: int = -1

    @property
    def n_stragglers(self) -> int:
        return len(self.s_vals)

    @property
    def fill(self) -> float:
        return (self.nnz - self.n_stragglers) / max(self.val.size, 1)

    @property
    def bytes_per_iter(self) -> int:
        return (self.val.size * (self.val.itemsize + self.lcol.itemsize
                                 + self.tsb.itemsize)
                + self.round_wrow.size * 8)


def pack_pseg(a: CSR, *, th: int = 256, divert_below: int | None = None,
              cache: bool = True) -> PSeg:
    """Pack CSR into PSEG rounds. Host-side, numpy + per-block greedy.

    Rounds that would carry fewer than ``divert_below`` nnz (of 1024 slots)
    are not emitted; their entries go to the straggler COO lists instead.
    The default (None) resolves per backend: **0 on accelerators** — the
    kernel streams padding at a measured 421 GB/s while the XLA COO
    side-path costs ~15 ns per straggler (uk-2002@0.05: divert=128 spends
    200 of 253 us on 0.49% of the nnz; divert=0 at fill 0.48 runs ~107 us
    — e14, round 4) — and **128 on the CPU backend**, where the economics
    invert (interpret-mode rounds are per-op python, stragglers are cheap
    numpy/XLA).

    Large packings persist across runs via plan_cache (the greedy round
    builder is python-loop bound, ~30s per Mnnz).
    """
    from . import plan_cache

    if divert_below is None:
        from .utils.backend import on_cpu

        divert_below = 128 if on_cpu() else 0

    if (cache and plan_cache.cache_enabled()
            and a.nnz >= plan_cache.MIN_CACHE_NNZ):
        params = {"th": th, "divert": divert_below, "v": 2}

        def build():
            w = _pack_pseg_impl(a, th=th, divert_below=divert_below)
            return {
                "val": w.val, "lcol": w.lcol, "tsb": w.tsb,
                "wrow": w.round_wrow, "oblk": w.round_oblk,
                "srow": w.s_rows, "scol": w.s_cols, "sval": w.s_vals,
                "meta": np.array([w.m, w.n, w.nnz, w.th, w.num_tiles,
                                  w.num_rounds, w.x2d_rows, w.y_rows],
                                 dtype=np.int64),
            }

        d = plan_cache.cached_arrays(a, "pseg", params, build)
        mt = d["meta"]
        return PSeg(
            m=int(mt[0]), n=int(mt[1]), nnz=int(mt[2]), th=int(mt[3]),
            num_tiles=int(mt[4]), num_rounds=int(mt[5]),
            val=d["val"], lcol=d["lcol"], tsb=d["tsb"],
            round_wrow=d["wrow"], round_oblk=d["oblk"],
            x2d_rows=int(mt[6]), y_rows=int(mt[7]),
            s_rows=d["srow"], s_cols=d["scol"], s_vals=d["sval"],
        )
    return _pack_pseg_impl(a, th=th, divert_below=divert_below)


def pack_pseg_hybrid(a: CSR, *, th: int = 256, cache: bool = True):
    """Hybrid PSEG v3 packing: win2 rounds for the hub panels (columns <
    HUB_PANELS*128 after popularity relabeling) + panel-bound TAIL_WIN
    rounds for everything else. Returns a PSeg with ``n_hub_rounds >= 0``,
    or None when the native round builder is unavailable (callers fall
    back to plain ``pack_pseg``).

    Why: with divert=0 on uk-2002@0.05, 0.7%% of the nnz (the cold-column
    tail) occupied 39%% of all rounds — each tail (block, lane) pair
    shatters into near-empty win2 rounds. Binding a tail slot's SUBLANE to
    its column's panel (slot (s, l) serves panels ws+s / ws+8+s, sel bit in
    lcol) widens the window 8x at LOWER kernel cost than the hub body (two
    direct (8,128) x2d slices replace the broadcast tables; round-4
    estimate: uk tail 1697 -> ~1300 rounds, total fill 0.48 -> ~0.65)."""
    from . import native, plan_cache

    if native._build_and_load() is None:
        return None
    if (cache and plan_cache.cache_enabled()
            and a.nnz >= plan_cache.MIN_CACHE_NNZ):
        params = {"th": th, "v": "h2"}

        def build():
            w = _pack_pseg_hybrid_impl(a, th=th)
            return {
                "val": w.val, "lcol": w.lcol, "tsb": w.tsb,
                "wrow": w.round_wrow, "oblk": w.round_oblk,
                "meta": np.array([w.m, w.n, w.nnz, w.th, w.num_tiles,
                                  w.num_rounds, w.x2d_rows, w.y_rows,
                                  w.n_hub_rounds], dtype=np.int64),
            }

        d = plan_cache.cached_arrays(a, "pseg_h", params, build)
        mt = d["meta"]
        z = np.zeros(0, dtype=INDEX_DTYPE)
        return PSeg(
            m=int(mt[0]), n=int(mt[1]), nnz=int(mt[2]), th=int(mt[3]),
            num_tiles=int(mt[4]), num_rounds=int(mt[5]),
            val=d["val"], lcol=d["lcol"], tsb=d["tsb"],
            round_wrow=d["wrow"], round_oblk=d["oblk"],
            x2d_rows=int(mt[6]), y_rows=int(mt[7]),
            s_rows=z, s_cols=z, s_vals=np.zeros(0, np.float32),
            n_hub_rounds=int(mt[8]),
        )
    return _pack_pseg_hybrid_impl(a, th=th)


def _pack_pseg_hybrid_impl(a: CSR, *, th: int):
    from . import native

    m, n = a.shape
    rows = a.row_ids().astype(np.int64)
    cols = a.indices.astype(np.int64)
    data = a.data.astype(np.float32)
    hub = cols < HUB_PANELS * LANES

    # --- hub rounds: the existing native win2 greedy, no diversion ---
    hr, hc, hv = rows[hub], cols[hub], data[hub]
    blk = hr // BLOCK_ROWS
    r_in = hr % BLOCK_ROWS
    tl = r_in % LANES
    ts = r_in // LANES
    pan = hc // LANES
    order = np.lexsort((pan, tl, blk))
    packed = native.pack_pseg_rounds(
        blk[order], tl[order], ts[order], pan[order], hc[order],
        hv[order], 1)
    if packed is None:
        return None
    Rh, valH, lcolH, tsbH, wrowH, oblkH, sidx = packed
    assert len(sidx) == 0  # divert=1 keeps every nonempty round

    # --- tail rounds: panel-bound TAIL_WIN windows, numpy-vectorized ---
    tr, tc, tv = rows[~hub], cols[~hub], data[~hub]
    if len(tv):
        tblk = tr // BLOCK_ROWS
        ttl = (tr % BLOCK_ROWS) % LANES
        tts = (tr % BLOCK_ROWS) // LANES
        # windows ALIGNED to TAIL_WIN panel boundaries: the kernel slices
        # x2d at pl.ds(ws, 8)/(ws+8, 8), and Mosaic dynamic sublane slices
        # at non-multiple-of-8 offsets return wrong data (measured 2e-4
        # rel-err on chip with ws = 2 mod 16; interpret mode doesn't care)
        pan_t = tc // LANES
        win = pan_t // TAIL_WIN
        off = pan_t % TAIL_WIN
        s = off % SUBLANES
        sel = off // SUBLANES
        lc = (tc % LANES + sel * LANES).astype(np.int64)
        nwin = int(win.max()) + 1
        key = ((tblk * nwin + win) * LANES + ttl) * SUBLANES + s
        order_t = np.argsort(key, kind="stable")
        ks = key[order_t]
        first = np.concatenate([[True], ks[1:] != ks[:-1]])
        grp = np.cumsum(first) - 1
        rank = np.arange(len(ks)) - np.flatnonzero(first)[grp]
        bw = ks // (LANES * SUBLANES)          # blk*nwin + win, sorted
        bw_first = np.concatenate([[True], bw[1:] != bw[:-1]])
        starts = np.flatnonzero(bw_first)
        nrounds_bw = np.maximum.reduceat(rank, starts) + 1
        round_base = np.concatenate([[0], np.cumsum(nrounds_bw)[:-1]])
        gbw = np.cumsum(bw_first) - 1
        r_ent = round_base[gbw] + rank
        Rt = int(nrounds_bw.sum())
        # Refuse before allocating: a shattered tail once projected 63M
        # rounds = a 241 GiB schedule (powerlaw-1M, pre heavy-row split).
        # 4 GiB of f32 tail slots ~= 8 streams of the largest sane packing.
        if Rt * SUBLANES * LANES * 4 > 4 * (1 << 30):
            raise ValueError(
                f"hybrid PSEG tail shattered: {Rt} rounds for {len(tv)} "
                f"tail nnz (fill {len(tv) / (Rt * 1024):.4f}); split heavy "
                "rows or use the XLA bucket path"
            )
        valT = np.zeros((Rt * SUBLANES, LANES), np.float32)
        lcolT = np.zeros((Rt * SUBLANES, LANES), np.int32)
        tsbT = np.zeros((Rt * SUBLANES, LANES), np.int32)
        arow = r_ent * SUBLANES + s[order_t]
        acol = ttl[order_t]
        valT[arow, acol] = tv[order_t]
        lcolT[arow, acol] = lc[order_t]
        tsbT[arow, acol] = tts[order_t]
        bw_ids = bw[starts]
        wrowT = np.repeat((bw_ids % nwin) * TAIL_WIN,
                          nrounds_bw).astype(np.int64)
        oblkT = np.repeat(bw_ids // nwin, nrounds_bw).astype(np.int64)
        x2d_tail = nwin * TAIL_WIN
    else:
        Rt = 0
        valT = np.zeros((0, LANES), np.float32)
        lcolT = np.zeros((0, LANES), np.int32)
        tsbT = np.zeros((0, LANES), np.int32)
        wrowT = np.zeros(0, np.int64)
        oblkT = np.zeros(0, np.int64)
        x2d_tail = 0

    # The hub and tail segments are each padded to WHOLE tiles: the
    # executor runs them as two separate branchless pallas_calls (a
    # per-round pl.when branch measured ~95 ns/round of pure predication
    # overhead — 4x the whole round cost) and sums the outputs.
    num_blocks = max(-(-m // BLOCK_ROWS), 1)
    ns = max(th // SUBLANES, 1)
    TH = max(-(-Rh // ns), 1)
    TT = -(-Rt // ns)
    total = (TH + TT) * ns
    val = np.zeros((total * SUBLANES, LANES), dtype=np.float32)
    lcol = np.zeros((total * SUBLANES, LANES), dtype=np.int16)
    tsb = np.zeros((total * SUBLANES, LANES), dtype=np.int16)
    wrow = np.zeros(total, dtype=np.int64)
    oblk = np.zeros(total, dtype=np.int64)
    val[: Rh * SUBLANES] = valH
    lcol[: Rh * SUBLANES] = lcolH
    tsb[: Rh * SUBLANES] = tsbH
    wrow[:Rh] = wrowH
    oblk[:Rh] = oblkH
    h0 = TH * ns
    val[(h0 + 0) * SUBLANES: (h0 + Rt) * SUBLANES] = valT
    lcol[(h0 + 0) * SUBLANES: (h0 + Rt) * SUBLANES] = lcolT
    tsb[(h0 + 0) * SUBLANES: (h0 + Rt) * SUBLANES] = tsbT
    wrow[h0: h0 + Rt] = wrowT
    oblk[h0: h0 + Rt] = oblkT
    return PSeg(
        m=m, n=n, nnz=a.nnz, th=ns * SUBLANES, num_tiles=TH + TT,
        num_rounds=total, val=val, lcol=lcol, tsb=tsb,
        round_wrow=wrow.astype(INDEX_DTYPE),
        round_oblk=oblk.astype(INDEX_DTYPE),
        x2d_rows=max(-(-n // LANES) + 1, x2d_tail, 16),
        y_rows=num_blocks * SUBLANES,
        s_rows=np.zeros(0, INDEX_DTYPE), s_cols=np.zeros(0, INDEX_DTYPE),
        s_vals=np.zeros(0, np.float32),
        n_hub_rounds=h0,
    )


def _pack_pseg_impl(a: CSR, *, th: int, divert_below: int) -> PSeg:
    m, n = a.shape
    rows = a.row_ids().astype(np.int64)
    cols = a.indices.astype(np.int64)
    data = a.data.astype(np.float32)

    blk = rows // BLOCK_ROWS
    r_in = rows % BLOCK_ROWS
    tl = r_in % LANES
    ts = r_in // LANES
    panel = cols // LANES

    # sort by (block, lane, panel) -> per-(block,lane) queues sorted by panel
    order = np.lexsort((panel, tl, blk))
    blk_s, tl_s, ts_s = blk[order], tl[order], ts[order]
    pan_s, col_s, val_s = panel[order], cols[order], data[order]

    # y2d must cover ALL m rows, not just blocks with nnz: trailing empty
    # rows (common after degree sorting) otherwise have no y slot, and the
    # unpermute gather clamps them onto the last nonempty row's value
    # (silent corruption — caught by round-2 code review).
    num_blocks = max(-(-m // BLOCK_ROWS), 1)

    # native C++ round builder (one linear pass; the python greedy below is
    # ~1 us/nnz, which matters at web-graph scale)
    from . import native

    packed = native.pack_pseg_rounds(blk_s, tl_s, ts_s, pan_s, col_s, val_s,
                                     divert_below)
    if packed is not None:
        R, valN, lcolN, tsbN, wrowN, oblkN, sidx = packed
        if len(sidx):
            s_rows = (blk_s[sidx] * BLOCK_ROWS + ts_s[sidx] * LANES
                      + tl_s[sidx]).astype(INDEX_DTYPE)
            s_cols = col_s[sidx].astype(INDEX_DTYPE)
            s_vals = val_s[sidx].astype(np.float32)
        else:
            s_rows = np.zeros(0, dtype=INDEX_DTYPE)
            s_cols = np.zeros(0, dtype=INDEX_DTYPE)
            s_vals = np.zeros(0, dtype=np.float32)
        ns = max(th // SUBLANES, 1)
        Rp = max(R, 1)            # zero rounds -> one all-zero pad round
        T = -(-Rp // ns)
        total = T * ns
        val = np.zeros((total * SUBLANES, LANES), dtype=np.float32)
        lcol = np.zeros((total * SUBLANES, LANES), dtype=np.int16)
        tsb = np.zeros((total * SUBLANES, LANES), dtype=np.int16)
        wrow = np.zeros(total, dtype=np.int64)
        oblk = np.zeros(total, dtype=np.int64)
        val[: R * SUBLANES] = valN
        lcol[: R * SUBLANES] = lcolN
        tsb[: R * SUBLANES] = tsbN
        wrow[:R] = wrowN
        oblk[:R] = oblkN
        return PSeg(
            m=m, n=n, nnz=a.nnz, th=ns * SUBLANES, num_tiles=T,
            num_rounds=Rp, val=val, lcol=lcol, tsb=tsb,
            round_wrow=wrow.astype(INDEX_DTYPE),
            round_oblk=oblk.astype(INDEX_DTYPE),
            x2d_rows=-(-n // LANES) + 1,
            y_rows=num_blocks * SUBLANES,
            s_rows=s_rows, s_cols=s_cols, s_vals=s_vals,
        )

    rounds = []  # (wrow, oblk, vt, ct, tt)
    strag = []   # index ranges diverted to the COO side-path

    # iterate blocks
    starts = np.searchsorted(blk_s, np.arange(num_blocks + 1))
    for b in range(num_blocks):
        lo, hi = int(starts[b]), int(starts[b + 1])
        if lo == hi:
            continue
        # per-lane queues within [lo, hi): already sorted by (lane, panel)
        lane_lo = lo + np.searchsorted(tl_s[lo:hi], np.arange(LANES))
        lane_hi = lo + np.searchsorted(tl_s[lo:hi], np.arange(LANES),
                                       side="right")
        heads = lane_lo.copy()
        while np.any(heads < lane_hi):
            active = heads < lane_hi
            w = int(pan_s[heads[active]].min())
            takes = []
            total = 0
            for l in np.flatnonzero(active):
                h = heads[l]
                stop = min(lane_hi[l], h + SUBLANES)
                # entries with panel in {w, w+1} (queue sorted by panel)
                cnt = int(np.searchsorted(pan_s[h:stop], w + 2))
                if cnt == 0:
                    continue
                takes.append((l, h, cnt))
                heads[l] = h + cnt
                total += cnt
            if total < divert_below:
                strag.extend((h, h + cnt) for _, h, cnt in takes)
                continue
            vt = np.zeros((SUBLANES, LANES), dtype=np.float32)
            ct = np.zeros((SUBLANES, LANES), dtype=np.int64)
            tt = np.zeros((SUBLANES, LANES), dtype=np.int64)
            for l, h, cnt in takes:
                sl = slice(h, h + cnt)
                vt[:cnt, l] = val_s[sl]
                ct[:cnt, l] = col_s[sl] - w * LANES
                tt[:cnt, l] = ts_s[sl]
            rounds.append((w, b, vt, ct, tt))

    if strag:
        idx = np.concatenate([np.arange(h0, h1) for h0, h1 in strag])
        s_rows = (blk_s[idx] * BLOCK_ROWS + ts_s[idx] * LANES
                  + tl_s[idx]).astype(INDEX_DTYPE)
        s_cols = col_s[idx].astype(INDEX_DTYPE)
        s_vals = val_s[idx].astype(np.float32)
    else:
        s_rows = np.zeros(0, dtype=INDEX_DTYPE)
        s_cols = np.zeros(0, dtype=INDEX_DTYPE)
        s_vals = np.zeros(0, dtype=np.float32)

    if not rounds:
        rounds.append((0, 0, np.zeros((SUBLANES, LANES), np.float32),
                       np.zeros((SUBLANES, LANES), np.int64),
                       np.zeros((SUBLANES, LANES), np.int64)))

    R = len(rounds)
    ns = max(th // SUBLANES, 1)
    T = -(-R // ns)
    total = T * ns
    val = np.zeros((total * SUBLANES, LANES), dtype=np.float32)
    lcol = np.zeros((total * SUBLANES, LANES), dtype=np.int16)
    tsb = np.zeros((total * SUBLANES, LANES), dtype=np.int16)
    wrow = np.zeros(total, dtype=np.int64)
    oblk = np.zeros(total, dtype=np.int64)
    for i, (w, b, vt, ct, tt) in enumerate(rounds):
        val[i * SUBLANES:(i + 1) * SUBLANES] = vt
        lcol[i * SUBLANES:(i + 1) * SUBLANES] = ct
        tsb[i * SUBLANES:(i + 1) * SUBLANES] = tt
        wrow[i] = w
        oblk[i] = b

    return PSeg(
        m=m, n=n, nnz=a.nnz, th=ns * SUBLANES, num_tiles=T, num_rounds=R,
        val=val, lcol=lcol, tsb=tsb,
        round_wrow=wrow.astype(INDEX_DTYPE),
        round_oblk=oblk.astype(INDEX_DTYPE),
        x2d_rows=-(-n // LANES) + 1,
        y_rows=num_blocks * SUBLANES,
        s_rows=s_rows, s_cols=s_cols, s_vals=s_vals,
    )


def pseg_to_dense(p: PSeg) -> np.ndarray:
    """Reconstruct the dense matrix (test helper)."""
    out = np.zeros((p.m, p.n), dtype=np.float64)
    n_hub = p.n_hub_rounds if p.n_hub_rounds >= 0 else p.num_rounds
    for i in range(p.num_rounds):
        w = int(p.round_wrow[i])
        b = int(p.round_oblk[i])
        for s in range(SUBLANES):
            arow = i * SUBLANES + s
            for l in range(LANES):
                v = p.val[arow, l]
                if v != 0.0:
                    row = b * BLOCK_ROWS + int(p.tsb[arow, l]) * LANES + l
                    lc = int(p.lcol[arow, l])
                    if i < n_hub:
                        col = w * LANES + lc        # win2: panel w or w+1
                    else:
                        # tail: slot sublane s serves panel w+s (sel 0 in
                        # lcol's high bit means panel w+8+s)
                        col = (w + s + (lc // LANES) * SUBLANES) * LANES \
                            + lc % LANES
                    out[row, col] += v
    for r, c, v in zip(p.s_rows, p.s_cols, p.s_vals):
        out[int(r), int(c)] += v
    return out
