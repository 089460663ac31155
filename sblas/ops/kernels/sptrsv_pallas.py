"""Pallas TPU SpTRSV kernel: level-set wavefront entirely on-chip
(SURVEY.md C7/C8 fast path).

Host analysis:
  1. level-set levels via the native C++ sweep (sblas.native),
  2. stable sort rows by level -> permutation P; the solve runs on the
     renumbered system (P L P^T)(P x) = P b, which is still lower-triangular
     because level order is topological,
  3. levels padded to whole 128-row blocks (block = the solve unit: 128
     renumbered rows = one lane-row of the VMEM x2d buffer; rows within a
     block are same-level, hence independent),
  4. each block's off-diagonal row chunks pack into w-SELL-style rounds
     (8 sublanes x 16 segments, 2-panel windows).

Device solve (one pallas_call, sequential TPU grid):
  x lives in VMEM as x2d[(n_pad/128), 128] — both the gather source for
  dependencies and the write target for solved blocks, so the whole
  wavefront never touches HBM except streaming the schedule. Per round:
  window-gather deps from x2d, multiply, MXU segment-reduce into a VMEM
  accumulator; on a block's last round, solve
  (b - acc) * inv_diag and write the 128 solved values back as one x2d
  lane-row (8 static sublane stores). Round order respects the level
  topology, and the TPU grid is sequential, so no synchronization is needed
  at all — the reference needs a kernel launch per level (SURVEY.md §3.3);
  here a level boundary costs nothing.

Deep-narrow level tails (the known TPU SpTRSV hard part, SURVEY.md §7
hard part 2) switch to the DENSE-TAIL HYBRID: trailing narrow levels pack
consecutively into 128-row blocks solved by a precomputed block inverse on
the MXU (rounds then carry only cross-block deps), so a fully serial factor
costs ~n/128 MXU matvecs instead of one padded block per level. f64 falls
back to the XLA path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR, INDEX_DTYPE
from ... import native

SUBLANES = 8
LANES = 128
SUB = 16          # segments per sublane: block = 8*16 = 128 rows
LPS = LANES // SUB


@dataclasses.dataclass(frozen=True, eq=False)
class TrsvLayout:
    n: int
    nnz: int
    nlevels: int
    num_blocks: int
    num_tiles: int
    th: int
    perm: np.ndarray          # permuted position -> original row
    slot_of_row: np.ndarray   # original row -> padded slot
    val: np.ndarray           # (T*th, 128) off-diagonal chunks
    lcol: np.ndarray          # (T*th, 128) int32 in [0, 256)
    round_wrow: np.ndarray    # (T*th/8,)
    round_oblk: np.ndarray    # (T*th/8,) block index
    round_final: np.ndarray   # (T*th/8,) 1 = last round of its block
    round_bfirst: np.ndarray  # (T*th/8,) 1 = first round of its block
    round_dense: np.ndarray   # (T*th/8,) 1 = final round of a dense-tail blk
    round_dblk: np.ndarray    # (T*th/8,) dense block index (0 otherwise)
    inv_diag: np.ndarray      # (num_blocks*8, 16)
    minvT: np.ndarray         # (max(n_dense,1)*128, 128) block inverses^T
    n_dense: int              # dense-tail 128-row blocks
    x2d_rows: int
    # panels per round window (lcol < nwin*128). Wide windows exist because
    # the solve is LATENCY-bound per round: on the 62k band factor the win2
    # packing needed 22272 rounds (23.5x padding — each row has ~1 dep per
    # panel across a 32-panel band, one round per panel), and extra gather
    # tables+selects are nearly free relative to the round chain (round 4).
    # e16 frontier sweep (experiments/e16_results.jsonl): nwin=32 is the
    # optimum — past it rounds stop shrinking (band 2128→1968, chol-nd
    # 608→560) while ns/round keeps climbing with the select chain
    # (308→485→610 ns at nwin 32/64/96). th=128 beats 256 on the band
    # factor by 16% (654.9 vs 761.1 µs); chol-nd prefers 256 by 5% —
    # defaults are nwin=32, th=128.
    nwin: int = 2


def build_layout(l: CSR, *, lower: bool = True, unit_diagonal: bool = False,
                 th: int = 128, nwin: int = 32,
                 cache: bool = True) -> TrsvLayout:
    """Level-set analysis + round packing, persisted across runs for large
    matrices via plan_cache (SURVEY.md §5 checkpoint analogue)."""
    from ... import plan_cache

    if (cache and plan_cache.cache_enabled()
            and l.nnz >= plan_cache.MIN_CACHE_NNZ):
        params = {"lower": lower, "unit": unit_diagonal, "th": th,
                  "nwin": nwin, "v": 3}

        def build():
            lay = _build_layout_impl(l, lower=lower,
                                     unit_diagonal=unit_diagonal, th=th,
                                     nwin=nwin)
            return {
                "perm": lay.perm, "slot": lay.slot_of_row, "val": lay.val,
                "lcol": lay.lcol, "wrow": lay.round_wrow,
                "oblk": lay.round_oblk, "final": lay.round_final,
                "bfirst": lay.round_bfirst, "dense": lay.round_dense,
                "dblk": lay.round_dblk, "invd": lay.inv_diag,
                "minvT": lay.minvT,
                "meta": np.array([lay.n, lay.nnz, lay.nlevels,
                                  lay.num_blocks, lay.num_tiles, lay.th,
                                  lay.x2d_rows, lay.n_dense, lay.nwin],
                                 dtype=np.int64),
            }

        d = plan_cache.cached_arrays(l, "trsv", params, build)
        mt = d["meta"]
        return TrsvLayout(
            n=int(mt[0]), nnz=int(mt[1]), nlevels=int(mt[2]),
            num_blocks=int(mt[3]), num_tiles=int(mt[4]), th=int(mt[5]),
            perm=d["perm"], slot_of_row=d["slot"], val=d["val"],
            lcol=d["lcol"], round_wrow=d["wrow"], round_oblk=d["oblk"],
            round_final=d["final"], round_bfirst=d["bfirst"],
            round_dense=d["dense"], round_dblk=d["dblk"],
            inv_diag=d["invd"], minvT=d["minvT"], n_dense=int(mt[7]),
            x2d_rows=int(mt[6]), nwin=int(mt[8]),
        )
    return _build_layout_impl(l, lower=lower, unit_diagonal=unit_diagonal,
                              th=th, nwin=nwin)


@dataclasses.dataclass(frozen=True, eq=False)
class TrsvAnalysis:
    """Level-set analysis products shared by the 1-RHS and multi-RHS round
    packers: the topological permutation, padded-slot maps, dense-tail
    split, diagonal scaling, and block inverses."""
    n: int
    nlevels: int
    num_blocks: int
    head_pad: int
    head_blocks: int
    n_dense: int
    order: np.ndarray         # permuted position -> original row
    slot_of_row: np.ndarray   # original row -> padded slot
    row_of_slot: np.ndarray   # padded slot -> original row (-1 = pad)
    diag: np.ndarray          # (n,) diagonal values (f64)
    inv_diag: np.ndarray      # (num_blocks*8, SUB) f32, 1 on dense slots
    minvT: np.ndarray         # (max(n_dense,1)*128, 128) block inverses^T


def _analyze(l: CSR, *, lower: bool, unit_diagonal: bool,
             order_key=None) -> TrsvAnalysis:
    n = l.shape[0]
    levels, nlevels = native.level_schedule(l.indptr, l.indices, n,
                                            lower=lower)
    # levels from level_schedule are already topological in ascending order
    # for BOTH sweeps (lower=False runs the backward sweep, so level 0 holds
    # the dependency-free bottom rows) — do NOT reverse for upper; reversing
    # put dependencies in same-or-later blocks and silently corrupted
    # sptrsv(U, b, lower=False) on the Pallas path (ADVICE r1, high).
    #
    # order_key: optional per-row sort key applied WITHIN each level — any
    # within-level permutation preserves the level topology, but it changes
    # which rows share a 128-row block and therefore the block's round
    # count (rows with similar dependency-slot windows pack into shared
    # rounds; e31 measures candidate keys).
    if order_key is None:
        order = np.lexsort((np.arange(n), levels))  # stable by (level, row)
    else:
        order = np.lexsort((np.arange(n), np.asarray(order_key), levels))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)

    level_sizes = np.bincount(levels, minlength=nlevels)

    # ---- dense-tail hybrid cutoff (SURVEY.md §7 hard part 2) ----
    # Deep-narrow level tails (Cholesky factors of meshes) would pad every
    # tiny level to a 128-row block. Instead, the trailing narrow levels
    # pack CONSECUTIVELY into blocks solved by a precomputed 128x128 block
    # inverse on the MXU; rounds then only carry cross-block deps.
    TAIL_LEVEL_WIDTH = 64
    MAX_TAIL_ROWS = 8192
    cut = nlevels
    tail_rows = 0
    for lv in range(nlevels - 1, -1, -1):
        sz = int(level_sizes[lv])
        if sz >= TAIL_LEVEL_WIDTH or tail_rows + sz > MAX_TAIL_ROWS:
            break
        tail_rows += sz
        cut = lv
    if tail_rows < 256:       # not worth the Minv stream
        cut = nlevels
        tail_rows = 0

    head_sizes = level_sizes[:cut]
    padded_head = ((head_sizes + 127) // 128) * 128
    head_pad = int(padded_head.sum())
    tail_pad = ((tail_rows + 127) // 128) * 128
    n_pad = head_pad + tail_pad
    num_blocks = n_pad // 128
    head_blocks = head_pad // 128
    n_dense = tail_pad // 128
    head_nrows = int(head_sizes.sum())

    # permuted-padded position of each permuted row: head rows padded per
    # level; tail rows consecutive after head_pad
    starts = np.concatenate([[0], np.cumsum(padded_head)]).astype(np.int64)
    lvl_of_sorted = levels[order]
    change = np.ones(n, dtype=bool)
    change[1:] = lvl_of_sorted[1:] != lvl_of_sorted[:-1]
    grp_start = np.maximum.accumulate(np.where(change, np.arange(n), 0))
    pos_in_level = np.arange(n) - grp_start
    lvl_index = np.cumsum(change) - 1  # dense level index in sorted order
    is_tail = lvl_index >= cut
    padded_pos = np.where(
        is_tail,
        head_pad + (np.arange(n) - head_nrows),
        starts[np.minimum(lvl_index, max(cut - 1, 0))] + pos_in_level,
    )

    # slot (padded id) of each original row
    slot_of_row = np.empty(n, dtype=np.int64)
    slot_of_row[order] = padded_pos
    # original row of each slot (or -1)
    row_of_slot = np.full(n_pad, -1, dtype=np.int64)
    row_of_slot[padded_pos] = order

    indptr = l.indptr.astype(np.int64)
    cols = l.indices.astype(np.int64)
    data = l.data

    # Wavefront safety: every off-diagonal dependency must sit in a strictly
    # earlier 128-row block than its row, EXCEPT inside dense-tail blocks,
    # where intra-block lower deps are handled by the block inverse.
    coo_rows_chk = l.row_ids().astype(np.int64)
    off_chk = (cols < coo_rows_chk) if lower else (cols > coo_rows_chk)
    dep_slot = slot_of_row[cols[off_chk]]
    own_slot = slot_of_row[coo_rows_chk[off_chk]]
    ok = (dep_slot // 128 < own_slot // 128) | (
        (dep_slot // 128 == own_slot // 128)
        & (dep_slot < own_slot) & (own_slot >= head_pad)
    )
    if not np.all(ok):
        raise AssertionError(
            "level schedule violates block topology (dependency in "
            "same-or-later 128-row block)"
        )

    # diagonal
    diag = np.ones(n, dtype=np.float64)
    if not unit_diagonal:
        coo_rows = l.row_ids().astype(np.int64)
        dm = coo_rows == cols
        got = np.zeros(n, dtype=bool)
        got[coo_rows[dm]] = True
        if not got.all():
            raise ValueError("rows missing diagonal entries")
        diag[coo_rows[dm]] = data[dm]
        if np.any(diag == 0.0):
            raise ValueError("zero diagonal; singular matrix")

    # inv_diag folded into the value stream and into b (host-side):
    # (b - sum l_j x_j) / d == b/d - sum (l_j/d) x_j. Stored in slot layout
    # for b_to_b2d; the kernel itself needs no diagonal buffer. Dense-tail
    # slots keep inv=1: their diagonal lives in the block inverse.
    inv_diag = np.ones((num_blocks * SUBLANES, SUB), dtype=np.float32)
    live = row_of_slot >= 0
    slots_live = np.flatnonzero(live)
    s_idx, k_idx = np.divmod(slots_live % 128, SUB)
    blk_idx = slots_live // 128
    inv_vals = 1.0 / diag[row_of_slot[slots_live]]
    inv_vals[slots_live >= head_pad] = 1.0
    inv_diag[blk_idx * SUBLANES + s_idx, k_idx] = inv_vals

    # dense-tail block inverses (transposed for the in-kernel row-vec @ MinvT)
    minvT = np.zeros((max(n_dense, 1) * 128, 128), dtype=np.float32)
    if n_dense:
        import scipy.linalg

        eye = np.eye(128, dtype=np.float64)
        for tb in range(n_dense):
            s0 = head_pad + tb * 128
            t_blk = np.eye(128, dtype=np.float64)
            for i in range(128):
                r = row_of_slot[s0 + i]
                if r < 0:
                    continue
                t_blk[i, i] = diag[r]
                for p in range(indptr[r], indptr[r + 1]):
                    c = int(cols[p])
                    if (c < r) if lower else (c > r):
                        j = int(slot_of_row[c]) - s0
                        if 0 <= j < 128:
                            t_blk[i, j] = data[p]
            minv = scipy.linalg.solve_triangular(t_blk, eye, lower=True)
            minvT[tb * 128:(tb + 1) * 128] = minv.T.astype(np.float32)

    return TrsvAnalysis(
        n=n, nlevels=nlevels, num_blocks=num_blocks, head_pad=head_pad,
        head_blocks=head_blocks, n_dense=n_dense, order=order,
        slot_of_row=slot_of_row, row_of_slot=row_of_slot, diag=diag,
        inv_diag=inv_diag, minvT=minvT,
    )


def _build_layout_impl(l: CSR, *, lower: bool = True,
                       unit_diagonal: bool = False,
                       th: int = 128, nwin: int = 32,
                       order_key=None) -> TrsvLayout:
    an = _analyze(l, lower=lower, unit_diagonal=unit_diagonal,
                  order_key=order_key)
    n = an.n
    nlevels = an.nlevels
    num_blocks = an.num_blocks
    head_pad = an.head_pad
    head_blocks = an.head_blocks
    n_dense = an.n_dense
    order = an.order
    slot_of_row = an.slot_of_row
    row_of_slot = an.row_of_slot
    diag = an.diag
    inv_diag = an.inv_diag
    minvT = an.minvT
    n_pad = num_blocks * 128
    indptr = l.indptr.astype(np.int64)
    cols = l.indices.astype(np.int64)
    data = l.data

    # rounds per block — native C++ fast path, python fallback
    packed = native.pack_trsv_rounds(
        l.indptr, l.indices, l.data, row_of_slot, slot_of_row,
        1.0 / diag, n_pad, lower, dense_from_slot=head_pad, win=nwin,
    )
    if packed is not None:
        R, valN, lcolN, wrowN, oblkN, finalN, bfirstN = packed
        ns = th // SUBLANES
        T = -(-max(R, 1) // ns)
        val = np.zeros((T * th, LANES), dtype=np.float32)
        lcol = np.zeros((T * th, LANES), dtype=np.int64)
        wrow = np.zeros(T * ns, dtype=np.int64)
        oblk = np.full(T * ns, num_blocks, dtype=np.int64)
        final = np.zeros(T * ns, dtype=np.int64)
        bfirst = np.ones(T * ns, dtype=np.int64)
        val[: R * SUBLANES] = valN
        lcol[: R * SUBLANES] = lcolN
        wrow[:R] = wrowN
        oblk[:R] = oblkN
        final[:R] = finalN
        bfirst[:R] = bfirstN
        dense = ((oblk >= head_blocks) & (oblk < num_blocks)
                 & (final == 1)).astype(np.int64)
        dblk = np.where(dense == 1, oblk - head_blocks, 0)
        return TrsvLayout(
            n=n, nnz=l.nnz, nlevels=nlevels, num_blocks=num_blocks,
            num_tiles=T, th=th, perm=order.astype(INDEX_DTYPE),
            slot_of_row=slot_of_row.astype(INDEX_DTYPE),
            val=val, lcol=lcol.astype(INDEX_DTYPE),
            round_wrow=wrow.astype(INDEX_DTYPE),
            round_oblk=oblk.astype(INDEX_DTYPE),
            round_final=final.astype(INDEX_DTYPE),
            round_bfirst=bfirst.astype(INDEX_DTYPE),
            round_dense=dense.astype(INDEX_DTYPE),
            round_dblk=dblk.astype(INDEX_DTYPE),
            inv_diag=inv_diag, minvT=minvT, n_dense=n_dense,
            x2d_rows=num_blocks + nwin - 1, nwin=nwin,
        )

    rounds = []  # (wrow, blk, final, bfirst, vt, ct)
    off = (cols < l.row_ids()) if lower else (cols > l.row_ids())
    for blk in range(num_blocks):
        dense_blk = blk >= head_blocks
        row_chunks = []
        for loff in range(128):
            r = row_of_slot[blk * 128 + loff]
            if r < 0:
                continue
            p0, p1 = indptr[r], indptr[r + 1]
            sel = off[p0:p1]
            if dense_blk:
                # intra-block deps live in the block inverse; no diag fold
                sel = sel & (slot_of_row[cols[p0:p1]] // 128 != blk)
            if not sel.any():
                continue
            c_orig = cols[p0:p1][sel]
            v = (data[p0:p1][sel] if dense_blk
                 else data[p0:p1][sel] / diag[r])
            c_slot = slot_of_row[c_orig]   # renumbered dependency columns
            o = np.argsort(c_slot, kind="stable")
            c_slot, v = c_slot[o], v[o]
            pan = c_slot // LANES
            chunks = []
            i = 0
            L = len(c_slot)
            while i < L:
                p = pan[i]
                j = i + 1
                # single-panel chunks; the 2-panel window comes from round
                # membership (p in {w, w+1}), matching retile_wsell
                while j < L and pan[j] == p and j - i < LPS:
                    j += 1
                chunks.append((int(p), v[i:j], c_slot[i:j] - p * LANES))
                i = j
            row_chunks.append((loff, chunks))
        if not row_chunks:
            # block still must be "solved" (pure b/diag): emit one empty round
            rounds.append((0, blk, 1, 1,
                           np.zeros((SUBLANES, LANES), dtype=data.dtype),
                           np.zeros((SUBLANES, LANES), dtype=np.int64)))
            continue
        nexts = {lo: 0 for lo, _ in row_chunks}
        chmap = dict(row_chunks)
        blk_rounds = []
        while True:
            pending = [(chmap[lo][nexts[lo]][0], lo) for lo in nexts
                       if nexts[lo] < len(chmap[lo])]
            if not pending:
                break
            wsel = min(p for p, _ in pending)
            vt = np.zeros((SUBLANES, LANES), dtype=data.dtype)
            ct = np.zeros((SUBLANES, LANES), dtype=np.int64)
            for _, lo in pending:
                s, k = divmod(lo, SUB)
                used = 0
                while nexts[lo] < len(chmap[lo]):
                    p, v, lc = chmap[lo][nexts[lo]]
                    if p > wsel + nwin - 1 or used + len(v) > LPS:
                        break
                    base = k * LPS + used
                    vt[s, base: base + len(v)] = v
                    ct[s, base: base + len(lc)] = lc + (p - wsel) * LANES
                    used += len(v)
                    nexts[lo] += 1
            blk_rounds.append((wsel, blk, 0, 0, vt, ct))
        blk_rounds[0] = blk_rounds[0][:3] + (1,) + blk_rounds[0][4:]
        blk_rounds[-1] = blk_rounds[-1][:2] + (1,) + blk_rounds[-1][3:]
        rounds.extend(blk_rounds)

    ns = th // SUBLANES
    R = len(rounds)
    T = -(-R // ns)
    val = np.zeros((T * th, LANES), dtype=data.dtype)
    lcol = np.zeros((T * th, LANES), dtype=np.int64)
    wrow = np.zeros(T * ns, dtype=np.int64)
    oblk = np.zeros(T * ns, dtype=np.int64)
    # pad rounds: non-final, block 0... must NOT trigger solve; use final=0
    # and block = num_blocks (a dump accumulator slab).
    final = np.zeros(T * ns, dtype=np.int64)
    bfirst = np.ones(T * ns, dtype=np.int64)  # pad rounds SET the dump slab
    oblk[:] = num_blocks
    for i, (w, b, f, bf, vt, ct) in enumerate(rounds):
        val[i * SUBLANES:(i + 1) * SUBLANES] = vt
        lcol[i * SUBLANES:(i + 1) * SUBLANES] = ct
        wrow[i] = w
        oblk[i] = b
        final[i] = f
        bfirst[i] = bf

    dense = ((oblk >= head_blocks) & (oblk < num_blocks)
             & (final == 1)).astype(np.int64)
    dblk = np.where(dense == 1, oblk - head_blocks, 0)
    return TrsvLayout(
        n=n, nnz=l.nnz, nlevels=nlevels, num_blocks=num_blocks,
        num_tiles=T, th=th, perm=order.astype(INDEX_DTYPE),
        slot_of_row=slot_of_row.astype(INDEX_DTYPE),
        val=val, lcol=lcol.astype(INDEX_DTYPE),
        round_wrow=wrow.astype(INDEX_DTYPE),
        round_oblk=oblk.astype(INDEX_DTYPE),
        round_final=final.astype(INDEX_DTYPE),
        round_bfirst=bfirst.astype(INDEX_DTYPE),
        round_dense=dense.astype(INDEX_DTYPE),
        round_dblk=dblk.astype(INDEX_DTYPE),
        inv_diag=inv_diag, minvT=minvT, n_dense=n_dense,
        x2d_rows=num_blocks + nwin - 1, nwin=nwin,
    )


def _segment_dot(p, seg, dot_mode):
    """(8,128) products -> (8,SUB) per-segment sums on the MXU.

    seg is a 0/1 selection matrix — EXACT in bf16 — so only the product
    plane needs splitting. HIGHEST on f32 costs 6 MXU passes; 'split3'
    (bf16 hi/mid/lo planes, DEFAULT dots) costs 3 passes + 5 VPU ops and
    keeps ~f32 accuracy (the SpMV split3 trick, DESIGN round-3).

    Measured (e25, experiments/e25_results.jsonl): the body is issue-bound,
    so the mode moves ns/round only 4-6% — band 364 (highest) / 350
    (split3) / 341 (split2); rel_err 5.5e-8 / 5.6e-8 / 9.0e-7. split3 is
    the default (small free win, same accuracy); split2/default trade
    accuracy for ~2% more and stay opt-in."""
    if dot_mode == "highest":
        return jnp.dot(p, seg, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    segb = seg.astype(jnp.bfloat16)
    hi = p.astype(jnp.bfloat16)
    if dot_mode == "default":
        return jnp.dot(hi, segb, preferred_element_type=jnp.float32)
    r1 = p - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    out = (jnp.dot(hi, segb, preferred_element_type=jnp.float32)
           + jnp.dot(mid, segb, preferred_element_type=jnp.float32))
    if dot_mode == "split2":
        return out
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return out + jnp.dot(lo, segb, preferred_element_type=jnp.float32)


def _kernel(th, n_dense, k: int = 1, nwin: int = 2, dot_mode: str = "split3"):
    """Wavefront kernel body for k right-hand sides.

    k > 1 runs k solves in one sequential grid pass sharing the schedule
    stream. Each RHS gets its OWN x2d/acc output refs — ref-granular
    aliasing lets Mosaic overlap the per-RHS gather/dot chains, which are
    off the (shared) block-dependency critical path; the solve is
    latency-bound, not bandwidth-bound (39 GB/s measured), so the extra
    per-RHS work is nearly free (SURVEY.md §3.3 / round-3 sptrsm finding).
    """
    ns = th // SUBLANES

    def kern(wrow_ref, oblk_ref, final_ref, bfirst_ref,
             dense_ref, dblk_ref, b_ref,
             val_ref, col_ref, minv_ref, *out_refs):
        # acc refs are OUTPUTS (not scratch): scratch does not persist
        # across grid steps in interpret mode; outputs do on both paths.
        x_refs = out_refs[:k]
        acc_refs = out_refs[k:]
        t = pl.program_id(0)

        seg = (jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB), 0) // LPS
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB), 1)
               ).astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            for kk in range(k):
                x_refs[kk][:] = jnp.zeros_like(x_refs[kk])
                acc_refs[kk][:] = jnp.zeros_like(acc_refs[kk])

        def bval(kk, slab):
            # b is (nb8, SUB) for k == 1 (the proven single-RHS call
            # signature) and (k, nb8, SUB) stacked for k > 1
            if k == 1:
                return b_ref[pl.ds(slab, SUBLANES), :]
            return b_ref[kk, pl.ds(slab, SUBLANES), :]

        for i in range(ns):
            w = wrow_ref[t * ns + i]
            b = oblk_ref[t * ns + i]
            fin = final_ref[t * ns + i]
            bfirst = bfirst_ref[t * ns + i]
            v = val_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.float32)
            c = col_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.int32)
            # per-window clamped gather indices (lcol in [0, nwin*128));
            # extra tables+selects are cheap here — the solve is latency-
            # bound per round, so nwin=8 buys ~4-8x fewer rounds on band
            # factors for a few VPU ops per round (round 4)
            cjs = [jnp.clip(c - j * 128, 0, 127) for j in range(nwin)]
            slab = b * SUBLANES
            for kk in range(k):
                x2d_ref = x_refs[kk]
                acc_ref = acc_refs[kk]
                g = None
                for j in range(nwin):
                    xw = x2d_ref[pl.ds(w + j, 1), :]
                    tab = jnp.broadcast_to(xw, (SUBLANES, 128))
                    gj = jnp.take_along_axis(tab, cjs[j], axis=1)
                    g = gj if g is None else jnp.where(c >= j * 128, gj, g)
                part = _segment_dot(v * g, seg, dot_mode)  # (8,SUB)
                # first round of a block SETS its slab (no dependence on
                # buffer init semantics); later rounds accumulate.
                acc_cur = acc_ref[pl.ds(slab, SUBLANES), :]
                acc_new = jnp.where(bfirst == 1, part, acc_cur + part)
                acc_ref[pl.ds(slab, SUBLANES), :] = acc_new

                if n_dense:
                    dn = dense_ref[t * ns + i]
                    db = dblk_ref[t * ns + i]

                    @pl.when((fin == 1) & (dn == 0))
                    def _(x2d_ref=x2d_ref, acc_new=acc_new, slab=slab,
                          b=b, kk=kk):
                        bv = bval(kk, slab)      # pre-scaled b/diag
                        solved = bv - acc_new    # (8, 16)
                        # write back as one x2d lane-row: lane l = s*16 + j
                        for s in range(SUBLANES):
                            x2d_ref[pl.ds(b, 1), s * SUB:(s + 1) * SUB] = (
                                solved[s:s + 1, :]
                            )

                    @pl.when((fin == 1) & (dn == 1))
                    def _(x2d_ref=x2d_ref, acc_new=acc_new, slab=slab,
                          b=b, kk=kk, db=db):
                        # dense-tail block: x_blk = Minv @ (b - acc), one
                        # MXU (1,128)@(128,128) matvec; b here is raw
                        # (inv_diag=1). The (8,16)->(1,128) relayout goes
                        # THROUGH the x2d row (8 lane-slice stores + one
                        # readback): a direct jnp.reshape of sublanes into
                        # lanes crashes the Mosaic compiler (experiments/
                        # e12b, round 3).
                        bv = bval(kk, slab)
                        rhs = bv - acc_new                    # (8, 16)
                        for s in range(SUBLANES):
                            x2d_ref[pl.ds(b, 1), s * SUB:(s + 1) * SUB] = (
                                rhs[s:s + 1, :]
                            )
                        xb = x2d_ref[pl.ds(b, 1), :]          # (1, 128)
                        mv = minv_ref[pl.ds(db * LANES, LANES), :]
                        sv = jnp.dot(xb, mv,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
                        x2d_ref[pl.ds(b, 1), :] = sv
                else:
                    @pl.when(fin == 1)
                    def _(x2d_ref=x2d_ref, acc_new=acc_new, slab=slab,
                          b=b, kk=kk):
                        bv = bval(kk, slab)      # pre-scaled b/diag
                        solved = bv - acc_new    # (8, 16)
                        for s in range(SUBLANES):
                            x2d_ref[pl.ds(b, 1), s * SUB:(s + 1) * SUB] = (
                                solved[s:s + 1, :]
                            )

    return kern


class PallasSptrsv:
    """Level-set Pallas SpTRSV executor (single chip)."""

    def __init__(self, l: CSR, *, lower: bool = True,
                 unit_diagonal: bool = False, th: int = 128, nwin: int = 32,
                 dot_mode: str = "split3"):
        if l.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        lay = build_layout(l, lower=lower, unit_diagonal=unit_diagonal, th=th,
                           nwin=nwin)
        vmem_est = (lay.x2d_rows * 128 + 2 * (lay.num_blocks + 1) * 128
                    + 2 * lay.th * 128 * 2 + lay.minvT.size) * 4
        if vmem_est > 20 * (1 << 20):
            raise ValueError(
                f"level structure too deep: {lay.nlevels} levels pad "
                f"{l.shape[0]} rows to {lay.num_blocks * 128} slots "
                f"(~{vmem_est >> 20} MB VMEM); XLA tiles path required"
            )
        self.layout = lay
        self.shape = l.shape
        self.dtype = l.dtype
        self.nlevels = lay.nlevels
        self.n_dense_blocks = lay.n_dense
        self.bytes_per_iter = (lay.val.size * 8 + lay.n * 8
                               + lay.n_dense * 128 * 128 * 4)
        self._val = jnp.asarray(lay.val)
        self._lcol = jnp.asarray(lay.lcol)
        self._wr = jnp.asarray(lay.round_wrow)
        self._ob = jnp.asarray(lay.round_oblk)
        self._fin = jnp.asarray(lay.round_final)
        self._bfirst = jnp.asarray(lay.round_bfirst)
        self._dense = jnp.asarray(lay.round_dense)
        self._dblk = jnp.asarray(lay.round_dblk)
        self._minvT = jnp.asarray(lay.minvT)
        self._invd = jnp.asarray(lay.inv_diag)
        self._perm = jnp.asarray(lay.perm)
        self._unperm = jnp.asarray(lay.slot_of_row)
        self._dot_mode = dot_mode
        # b layout map: b2d[blk*8+s, k] = b_perm[blk*128 + s*16 + k]
        self._kcalls = {}
        self._call = self._build(1)

    # per-call multi-RHS cap: ns * k unrolled bodies must stay inside the
    # Mosaic compile budget (~512 measured for the spmm kernel family)
    MAX_RHS = 8

    def _build(self, k: int):
        if k in self._kcalls:
            return self._kcalls[k]
        lay = self.layout
        if k > self.MAX_RHS:
            raise ValueError(f"k={k} exceeds MAX_RHS={self.MAX_RHS}")
        # Scoped-VMEM estimate. Besides the k x2d/acc/b buffers, Mosaic
        # keeps the unrolled rounds' temporaries on the VMEM stack — the
        # dominant term for deep tilings (measured: 21 MB at ns=32, k=8 on
        # a 22k-round band factor, vs the 16 MB hardware limit).
        ns = lay.th // SUBLANES
        per_rhs = (lay.x2d_rows * 128
                   + 2 * (lay.num_blocks + 1) * 128) * 4
        stack_est = ns * k * (SUBLANES * 128 * 4) * 5
        if k > 1 and (k * per_rhs + lay.minvT.size * 4 + stack_est
                      > 14 * (1 << 20)):
            raise ValueError(
                f"k={k} RHS exceed the VMEM budget for this level structure"
            )
        from ...utils.backend import on_cpu
        interpret = on_cpu()
        idx = lambda t, wr, ob, fin, bf, dn, db: (t, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(lay.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # b2d (pre-scaled)
                pl.BlockSpec((lay.th, LANES), idx),
                pl.BlockSpec((lay.th, LANES), idx),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # minvT whole
            ],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(2 * k)
            ),
        )
        call = pl.pallas_call(
            _kernel(lay.th, lay.n_dense, k, lay.nwin, self._dot_mode),
            grid_spec=grid_spec,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((lay.x2d_rows, LANES), jnp.float32)
                 for _ in range(k)]
                + [jax.ShapeDtypeStruct(
                    ((lay.num_blocks + 1) * SUBLANES, SUB), jnp.float32)
                   for _ in range(k)]
            ),
            interpret=interpret,
        )
        self._kcalls[k] = call
        return call

    def device_arrays(self):
        return {"wr": self._wr, "ob": self._ob, "fin": self._fin,
                "bfirst": self._bfirst, "dense": self._dense,
                "dblk": self._dblk, "minvT": self._minvT,
                "val": self._val, "lcol": self._lcol, "invd": self._invd,
                "perm": self._perm, "unperm": self._unperm}

    def solve_permuted(self, arrs, b2d):
        """Core solve on the renumbered system: b2d (num_blocks*8, 16) ->
        x2d (x2d_rows, 128). No permutation gathers — the benchmark path."""
        x2d, _acc = self._call(arrs["wr"], arrs["ob"], arrs["fin"],
                               arrs["bfirst"], arrs["dense"], arrs["dblk"],
                               b2d, arrs["val"], arrs["lcol"], arrs["minvT"])
        return x2d

    def solve_permuted_multi(self, arrs, b3d):
        """k simultaneous solves sharing one schedule pass: b3d is
        (k, num_blocks*8, 16) stacked pre-scaled RHS; returns
        (k, x2d_rows, 128). k <= MAX_RHS; callers chunk larger batches."""
        k = b3d.shape[0]
        if k == 1:
            return self.solve_permuted(arrs, b3d[0])[None]
        call = self._build(k)
        outs = call(arrs["wr"], arrs["ob"], arrs["fin"],
                    arrs["bfirst"], arrs["dense"], arrs["dblk"],
                    b3d, arrs["val"], arrs["lcol"], arrs["minvT"])
        return jnp.stack(outs[:k])

    def b_to_b2d(self, b: np.ndarray) -> np.ndarray:
        """Host-side permute+pad+diag-scale of b (numpy, fast)."""
        lay = self.layout
        b_pad = np.zeros(lay.num_blocks * 128, dtype=np.float32)
        b_pad[np.asarray(lay.slot_of_row)] = np.asarray(b, dtype=np.float32)
        b2d = b_pad.reshape(lay.num_blocks * SUBLANES, SUB)
        return b2d * np.asarray(lay.inv_diag)

    def x2d_to_x(self, x2d: np.ndarray) -> np.ndarray:
        """Host-side unpermute of the solve result (numpy, fast)."""
        lay = self.layout
        flat = np.asarray(x2d)[: lay.num_blocks].reshape(-1)
        return flat[np.asarray(lay.slot_of_row)].astype(self.dtype)

    def apply_pure(self, arrs, b):
        """Device-composable solve. The permutation gathers use XLA gather,
        which is slow on TPU (~0.2 Gelem/s measured) — for repeated solves
        prefer solve_permuted with host-side b_to_b2d/x2d_to_x."""
        lay = self.layout
        n = lay.n
        # scatter b into padded-slot order (padding is inserted per level,
        # not appended)
        b_pad = jnp.zeros(lay.num_blocks * 128, jnp.float32)
        b_pad = b_pad.at[arrs["unperm"]].set(b.astype(jnp.float32))
        b2d = b_pad.reshape(lay.num_blocks * SUBLANES, SUB) * arrs["invd"]
        x2d = self.solve_permuted(arrs, b2d)
        x_perm = x2d[: lay.num_blocks].reshape(-1)
        return x_perm[arrs["unperm"]].astype(self.dtype)

    def apply_traced(self, b):
        return self.apply_pure(self.device_arrays(), b)


# ---------------------------------------------------------------------------
# Multi-RHS wavefront: k <= 8 right-hand sides on SUBLANES (VERDICT r1
# item 5 — "RHS-in-lanes" family).
#
# The per-RHS-refs kernel above duplicates the whole gather/select/dot chain
# per RHS, and measurement showed those chains serialize in issue slots
# (k=8 costs 7.7-8.1x one SpTRSV). The structural fix exploits the fact
# that wavefront rounds are mostly EMPTY (latency-bound, ~1-2 deps per row
# per window): re-shape the round so its idle capacity carries the RHS
# batch instead of air.
#
#   - x2d_m: row w*8 + kk = solution window w (128 slots) of RHS kk.
#   - A round targets ONE 16-row group q of a block: lane = j*8 + s is dep
#     slot s of group-row j; indices/values are SHARED across RHS (one
#     (1,128) ct/vt per round).
#   - The gather table is x2d_m[(w+j)*8 : +8] — sublane kk is RHS kk's
#     window row — so ONE take_along_axis(axis=1) with the broadcast index
#     row serves all 8 RHS (per-sublane tables, shared lanes).
#   - ONE MXU (8,128)@(128,16) segment-reduce yields (RHS, row) partials.
#   - Dense-tail blocks solve all 8 RHS in ONE (8,128)@(128,128) MXU pass.
#
# Per-product op count is unchanged (the 1024-products-per-gather invariant
# is layout-independent); the win is that sparse rounds now carry 8 RHS in
# lanes that previously idled. Capacity-bound blocks (>128 pairs per 16-row
# group per window) split into extra rounds and degrade gracefully toward
# the old kx cost.
# ---------------------------------------------------------------------------

LPS_M = 8       # dep slots per group-row in a multi-RHS round
GROUP = 16      # rows per (block, q) group: 8 groups per 128-slot block


@dataclasses.dataclass(frozen=True, eq=False)
class TrsvLayoutM:
    n: int
    nnz: int
    nlevels: int
    num_blocks: int
    num_tiles: int
    th: int                   # rounds per grid step (tile rows)
    perm: np.ndarray
    slot_of_row: np.ndarray
    val: np.ndarray           # (T*th, 128) one round per row
    lcol: np.ndarray          # (T*th, 128) int32 in [0, nwin*128)
    round_wrow: np.ndarray    # (T*th,)
    round_oblk: np.ndarray    # (T*th,)
    round_qgrp: np.ndarray    # (T*th,) 16-row group within the block
    round_final: np.ndarray   # (T*th,) 1 = last round of its block
    round_bfirst: np.ndarray  # (T*th,) 1 = first round of its (b, q) tile
    round_dense: np.ndarray   # (T*th,) 1 = final round of a dense-tail blk
    round_dblk: np.ndarray    # (T*th,)
    inv_diag: np.ndarray      # (num_blocks*8, SUB) — for b3d scaling
    minvT: np.ndarray
    n_dense: int
    head_pad: int
    x_rows: int               # x2d_m rows / 8 (windows incl. nwin-1 guard)
    nwin: int


def build_layout_m(l: CSR, *, lower: bool = True,
                   unit_diagonal: bool = False, th: int = 4,
                   nwin: int = 16, cache: bool = True) -> TrsvLayoutM:
    from ... import plan_cache

    if (cache and plan_cache.cache_enabled()
            and l.nnz >= plan_cache.MIN_CACHE_NNZ):
        params = {"lower": lower, "unit": unit_diagonal, "th": th,
                  "nwin": nwin, "v": 4}

        def build():
            lay = _build_layout_m_impl(l, lower=lower,
                                       unit_diagonal=unit_diagonal, th=th,
                                       nwin=nwin)
            return {
                "perm": lay.perm, "slot": lay.slot_of_row, "val": lay.val,
                "lcol": lay.lcol, "wrow": lay.round_wrow,
                "oblk": lay.round_oblk, "qgrp": lay.round_qgrp,
                "final": lay.round_final, "bfirst": lay.round_bfirst,
                "dense": lay.round_dense, "dblk": lay.round_dblk,
                "invd": lay.inv_diag, "minvT": lay.minvT,
                "meta": np.array([lay.n, lay.nnz, lay.nlevels,
                                  lay.num_blocks, lay.num_tiles, lay.th,
                                  lay.x_rows, lay.n_dense, lay.nwin,
                                  lay.head_pad], dtype=np.int64),
            }

        d = plan_cache.cached_arrays(l, "trsvm", params, build)
        mt = d["meta"]
        return TrsvLayoutM(
            n=int(mt[0]), nnz=int(mt[1]), nlevels=int(mt[2]),
            num_blocks=int(mt[3]), num_tiles=int(mt[4]), th=int(mt[5]),
            perm=d["perm"], slot_of_row=d["slot"], val=d["val"],
            lcol=d["lcol"], round_wrow=d["wrow"], round_oblk=d["oblk"],
            round_qgrp=d["qgrp"], round_final=d["final"],
            round_bfirst=d["bfirst"], round_dense=d["dense"],
            round_dblk=d["dblk"], inv_diag=d["invd"], minvT=d["minvT"],
            n_dense=int(mt[7]), head_pad=int(mt[9]), x_rows=int(mt[6]),
            nwin=int(mt[8]),
        )
    return _build_layout_m_impl(l, lower=lower, unit_diagonal=unit_diagonal,
                                th=th, nwin=nwin)


def _build_layout_m_impl(l: CSR, *, lower: bool, unit_diagonal: bool,
                         th: int, nwin: int) -> TrsvLayoutM:
    an = _analyze(l, lower=lower, unit_diagonal=unit_diagonal)
    n = an.n
    num_blocks = an.num_blocks
    head_pad = an.head_pad
    head_blocks = an.head_blocks

    cols = l.indices.astype(np.int64)
    data = l.data.astype(np.float64)
    rows_coo = l.row_ids().astype(np.int64)
    off = (cols < rows_coo) if lower else (cols > rows_coo)
    own = an.slot_of_row[rows_coo[off]].astype(np.int64)
    dep = an.slot_of_row[cols[off]].astype(np.int64)
    v = data[off]
    # head rows fold 1/diag into the value stream; dense-tail rows keep raw
    # values and drop intra-block deps (the block inverse carries them)
    dense_mask = own >= head_pad
    scale = np.where(dense_mask, 1.0, 1.0 / an.diag[rows_coo[off]])
    v = v * scale
    keep = ~(dense_mask & (dep // 128 == own // 128))
    own, dep, v = own[keep], dep[keep], v[keep]

    # sort by (block, qgrp, row, dep slot)
    o = np.lexsort((dep, own))
    own, dep, v = own[o], dep[o], v[o]

    blk = own // 128
    qg = (own % 128) // GROUP
    rowj = own % GROUP
    pan = dep // LANES

    rounds = []     # (w, b, q, fin, bf, vt(128,), ct(128,))

    # group boundaries per (blk, qgrp)
    key = blk * 8 + qg
    # per block: list of its (b,q) segment ranges
    idx_sorted = np.arange(len(own))
    # boundaries of equal (blk,qgrp) runs
    if len(own):
        cut_pts = np.flatnonzero(np.diff(key)) + 1
        seg_starts = np.concatenate([[0], cut_pts])
        seg_ends = np.concatenate([cut_pts, [len(own)]])
        seg_of_block: dict[int, list[tuple[int, int]]] = {}
        for s0, s1 in zip(seg_starts, seg_ends):
            seg_of_block.setdefault(int(blk[s0]), []).append((int(s0),
                                                             int(s1)))
    else:
        seg_of_block = {}

    for b in range(num_blocks):
        b_rounds = []
        for (s0, s1) in seg_of_block.get(b, []):
            q = int(qg[s0])
            # per-row cursors within this (b, q) segment
            ptr = {}
            for i in range(s0, s1):
                ptr.setdefault(int(rowj[i]), []).append(i)
            nexts = {j: 0 for j in ptr}
            while True:
                pend = [(int(pan[ptr[j][nexts[j]]]), j) for j in ptr
                        if nexts[j] < len(ptr[j])]
                if not pend:
                    break
                wsel = min(p for p, _ in pend)
                vt = np.zeros(LANES, dtype=np.float32)
                ct = np.zeros(LANES, dtype=np.int64)
                first = 0   # overwritten on the block's first round below
                for _, j in pend:
                    used = 0
                    while nexts[j] < len(ptr[j]) and used < LPS_M:
                        i = ptr[j][nexts[j]]
                        p = int(pan[i])
                        if p > wsel + nwin - 1:
                            break
                        vt[j * LPS_M + used] = v[i]
                        ct[j * LPS_M + used] = dep[i] - wsel * LANES
                        used += 1
                        nexts[j] += 1
                b_rounds.append([wsel, b, q, 0, first, vt, ct])
        if not b_rounds:
            # dependency-free block (pure b/diag) still needs its SET +
            # solve trigger
            b_rounds.append([0, b, 0, 0, 0,
                             np.zeros(LANES, np.float32),
                             np.zeros(LANES, np.int64)])
        # acc granularity is one (8 RHS, 128) tile per BLOCK (lane =
        # q*16 + j): the block's first round SETs the whole tile (zeros
        # outside its own group's lanes), so no up-front acc zeroing is
        # needed anywhere
        b_rounds[0][4] = 1
        b_rounds[-1][3] = 1     # final round of the block
        rounds.extend(b_rounds)

    # ---- fat-round assembly ----
    # A fat round carries up to 8 thin (1,128) rows of the SAME block —
    # each row keeps its own (w, q) scalars (the per-row window gathers
    # cost the same either way), while the latency-bound per-round chain
    # (scalar fetch, acc read-modify-write, bfirst select, control) is paid
    # ONCE per fat round instead of once per 128-slot row. On the 62k band
    # factor this cuts 15.6k thin rounds to ~2k fat rounds; the thin
    # variant measured 355 ns/round — almost all of it chain, not gathers.
    fat = []        # (b, fin, bf, dense_flag, [thin rows])
    i0 = 0
    while i0 < len(rounds):
        b = rounds[i0][1]
        i1 = i0
        while i1 < len(rounds) and rounds[i1][1] == b:
            i1 += 1
        blk_thin = rounds[i0:i1]
        nfat = -(-len(blk_thin) // SUBLANES)
        for f_i in range(nfat):
            chunk = blk_thin[f_i * SUBLANES:(f_i + 1) * SUBLANES]
            fat.append([b, 1 if f_i == nfat - 1 else 0,
                        1 if f_i == 0 else 0, chunk])
        i0 = i1

    R = len(fat)
    T = max(-(-R // th), 1)
    val = np.zeros((T * th * SUBLANES, LANES), dtype=np.float32)
    lcol = np.zeros((T * th * SUBLANES, LANES), dtype=np.int64)
    wrow = np.zeros(T * th * SUBLANES, dtype=np.int64)
    qgrp = np.zeros(T * th * SUBLANES, dtype=np.int64)
    oblk = np.full(T * th, num_blocks, dtype=np.int64)   # pad -> dump slab
    final = np.zeros(T * th, dtype=np.int64)
    bfirst = np.ones(T * th, dtype=np.int64)
    for i, (b, f, bf, chunk) in enumerate(fat):
        oblk[i] = b
        final[i] = f
        bfirst[i] = bf
        for g, (w, _b, q, _f, _bf, vt, ct) in enumerate(chunk):
            val[i * SUBLANES + g] = vt
            lcol[i * SUBLANES + g] = ct
            wrow[i * SUBLANES + g] = w
            qgrp[i * SUBLANES + g] = q

    dense = ((oblk >= head_blocks) & (oblk < num_blocks)
             & (final == 1)).astype(np.int64)
    dblk = np.where(dense == 1, oblk - head_blocks, 0)
    return TrsvLayoutM(
        n=n, nnz=l.nnz, nlevels=an.nlevels, num_blocks=num_blocks,
        num_tiles=T, th=th, perm=an.order.astype(INDEX_DTYPE),
        slot_of_row=an.slot_of_row.astype(INDEX_DTYPE),
        val=val, lcol=lcol.astype(INDEX_DTYPE),
        round_wrow=wrow.astype(INDEX_DTYPE),
        round_oblk=oblk.astype(INDEX_DTYPE),
        round_qgrp=qgrp.astype(INDEX_DTYPE),
        round_final=final.astype(INDEX_DTYPE),
        round_bfirst=bfirst.astype(INDEX_DTYPE),
        round_dense=dense.astype(INDEX_DTYPE),
        round_dblk=dblk.astype(INDEX_DTYPE),
        inv_diag=an.inv_diag, minvT=an.minvT, n_dense=an.n_dense,
        head_pad=head_pad, x_rows=num_blocks + nwin - 1, nwin=nwin,
    )


def _kernel_m(th, n_dense, nwin, dot_mode: str = "split3"):
    """Multi-RHS wavefront body: sublane = RHS, lane = (group-row, dep).

    acc and b are per-BLOCK (8 RHS, 128) tiles whose lane layout (q*16 + j)
    matches the x2d_m row layout — an (N, 16) layout would be silently
    lane-padded 8x in VMEM (measured: the first cut's 42112x16 acc padded
    to 20.6 MB and OOMed the scoped-VMEM budget on the band factor).

    A fat round = up to 8 thin (1,128) schedule rows of ONE block, each
    with its own (w, q) scalars. The per-row partial goes straight to the
    full (8,128) acc layout through a single combined segment-reduce +
    lane-place dot: SS[l, col] = (col == q*16 + l//8) — the per-row sums
    land at lanes [q*16, q*16+16) in one MXU pass. The fat grouping exists
    because the thin variant measured 355 ns/round with ~100 ns of gather
    work: the round chain (scalar fetch, acc RMW, control) dominates, so
    it is amortized over 8 rows."""

    def kern(wrow_ref, oblk_ref, qg_ref, final_ref, bfirst_ref,
             dense_ref, dblk_ref, b_ref, val_ref, col_ref, minv_ref,
             x_ref, acc_ref):
        t = pl.program_id(0)

        # base[l, col] = col - l//8: SS_q = (base == q*16) per row
        base = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                - jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                // LPS_M)

        # No whole-buffer zeroing: every block's final solve overwrites all
        # its x lanes and bfirst=1 SETs the whole block acc tile; pad-lane
        # garbage (incl. NaN bit patterns) is selected out below. (A t==0
        # zeroing of multi-MB outputs also materializes equally-sized zero
        # temporaries on the Mosaic VMEM stack.)

        for i in range(th):
            r = t * th + i
            b = oblk_ref[r]
            fin = final_ref[r]
            bf = bfirst_ref[r]
            total = None
            for gi in range(SUBLANES):
                rg = r * SUBLANES + gi
                w = wrow_ref[rg]
                q = qg_ref[rg]
                row = i * SUBLANES + gi
                v = val_ref[row:row + 1, :].astype(jnp.float32)   # (1, 128)
                c = col_ref[row:row + 1, :].astype(jnp.int32)     # (1, 128)
                cfull = jnp.broadcast_to(c, (SUBLANES, LANES))
                vb = jnp.broadcast_to(v, (SUBLANES, LANES))
                g = None
                for j in range(nwin):
                    cj = jnp.broadcast_to(jnp.clip(c - j * 128, 0, 127),
                                          (SUBLANES, LANES))
                    tab = x_ref[pl.ds((w + j) * SUBLANES, SUBLANES), :]
                    gj = jnp.take_along_axis(tab, cj, axis=1)
                    g = gj if g is None else jnp.where(cfull >= j * 128,
                                                       gj, g)
                # pad lanes (v == 0) may gather garbage (incl. NaN bit
                # patterns — nothing zeroes x up front): select, don't
                # multiply
                prod = jnp.where(vb != 0.0, vb * g, 0.0)
                ss = (base == q * GROUP).astype(jnp.float32)
                part = _segment_dot(prod, ss, dot_mode)       # (8,128)
                total = part if total is None else total + part
            slab = b * SUBLANES
            acc_cur = acc_ref[pl.ds(slab, SUBLANES), :]
            acc_new = jnp.where(bf == 1, total, acc_cur + total)
            acc_ref[pl.ds(slab, SUBLANES), :] = acc_new

            if n_dense:
                dn = dense_ref[r]
                db = dblk_ref[r]

                @pl.when((fin == 1) & (dn == 0))
                def _(b=b, acc_new=acc_new, slab=slab):
                    bv = b_ref[pl.ds(slab, SUBLANES), :]
                    x_ref[pl.ds(slab, SUBLANES), :] = bv - acc_new

                @pl.when((fin == 1) & (dn == 1))
                def _(b=b, db=db, acc_new=acc_new, slab=slab):
                    bv = b_ref[pl.ds(slab, SUBLANES), :]
                    rhs = bv - acc_new                            # (8, 128)
                    mv = minv_ref[pl.ds(db * LANES, LANES), :]
                    x_ref[pl.ds(slab, SUBLANES), :] = jnp.dot(
                        rhs, mv, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            else:
                @pl.when(fin == 1)
                def _(b=b, acc_new=acc_new, slab=slab):
                    bv = b_ref[pl.ds(slab, SUBLANES), :]
                    x_ref[pl.ds(slab, SUBLANES), :] = bv - acc_new

    return kern


def _retile_layout_m(lay: TrsvLayoutM, th2: int) -> TrsvLayoutM:
    """Re-tile a packed multi-RHS layout to a smaller tile height (pure
    re-padding with benign dump rounds; the round contents are unchanged).
    val/lcol/wrow/qgrp carry 8 rows per fat round."""
    total = lay.round_oblk.shape[0]
    T2 = -(-total // th2)
    pad = T2 * th2 - total

    def pad2(a, fill=0, mult=1):
        p = pad * mult
        return np.concatenate(
            [a, np.full((p,) + a.shape[1:], fill, a.dtype)]) if p else a

    return dataclasses.replace(
        lay, th=th2, num_tiles=T2,
        val=pad2(lay.val, mult=SUBLANES),
        lcol=pad2(lay.lcol, mult=SUBLANES),
        round_wrow=pad2(lay.round_wrow, mult=SUBLANES),
        round_qgrp=pad2(lay.round_qgrp, mult=SUBLANES),
        round_oblk=pad2(lay.round_oblk, lay.num_blocks),
        round_final=pad2(lay.round_final),
        round_bfirst=pad2(lay.round_bfirst, 1),
        round_dense=pad2(lay.round_dense),
        round_dblk=pad2(lay.round_dblk),
    )


class PallasSptrsvLanes:
    """Multi-RHS (k <= 8 on sublanes) wavefront executor."""

    MAX_RHS = 8

    def __init__(self, l: CSR, *, lower: bool = True,
                 unit_diagonal: bool = False, th: int = 4, nwin: int = 16,
                 dot_mode: str = "split3"):
        if l.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        self._dot_mode = dot_mode
        lay = build_layout_m(l, lower=lower, unit_diagonal=unit_diagonal,
                             th=th, nwin=nwin)
        # Scoped-VMEM budget = whole buffers (x + acc + b + minv +
        # double-buffered schedule tiles) + the Mosaic stack for the
        # unrolled round bodies (~5 (8,128) f32 temporaries per schedule
        # row per window). Shrink the tile height (pure re-pad, no repack)
        # until the estimate fits.
        buffers = (lay.x_rows * 8 * 128 + 2 * (lay.num_blocks + 1) * 8 * 128
                   + lay.minvT.size) * 4
        chosen = None
        for th_try in (lay.th, 2, 1):
            stack = th_try * SUBLANES * lay.nwin * 5 * SUBLANES * LANES * 4
            tiles = 2 * th_try * SUBLANES * LANES * 8
            if buffers + stack + tiles <= 14 * (1 << 20):
                chosen = th_try
                break
        if chosen is None:
            raise ValueError(
                f"multi-RHS wavefront buffers ({buffers >> 20} MB) leave no "
                "VMEM stack headroom; use the per-RHS chunked path"
            )
        if chosen != lay.th:
            lay = _retile_layout_m(lay, chosen)
        self.layout = lay
        self.shape = l.shape
        self.dtype = l.dtype
        self.nlevels = lay.nlevels
        self.bytes_per_iter = lay.val.size * 8 + lay.n * 8 * 4
        self._val = jnp.asarray(lay.val)
        self._lcol = jnp.asarray(lay.lcol)
        self._wr = jnp.asarray(lay.round_wrow)
        self._ob = jnp.asarray(lay.round_oblk)
        self._qg = jnp.asarray(lay.round_qgrp)
        self._fin = jnp.asarray(lay.round_final)
        self._bfirst = jnp.asarray(lay.round_bfirst)
        self._dense = jnp.asarray(lay.round_dense)
        self._dblk = jnp.asarray(lay.round_dblk)
        self._minvT = jnp.asarray(lay.minvT)
        self._call = self._build()

    def _build(self):
        from ...utils.backend import on_cpu

        lay = self.layout
        idx = lambda t, *_: (t, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(lay.num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # b3d whole
                pl.BlockSpec((lay.th * SUBLANES, LANES), idx),   # val
                pl.BlockSpec((lay.th * SUBLANES, LANES), idx),   # lcol
                pl.BlockSpec(memory_space=pltpu.VMEM),   # minvT whole
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x2d_m
                pl.BlockSpec(memory_space=pltpu.VMEM),   # acc
            ),
        )
        return pl.pallas_call(
            _kernel_m(lay.th, lay.n_dense, lay.nwin, self._dot_mode),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((lay.x_rows * SUBLANES, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct(((lay.num_blocks + 1) * SUBLANES,
                                      LANES), jnp.float32),
            ),
            interpret=on_cpu(),
        )

    def device_arrays(self):
        return {"wr": self._wr, "ob": self._ob, "qg": self._qg,
                "fin": self._fin, "bfirst": self._bfirst,
                "dense": self._dense, "dblk": self._dblk,
                "minvT": self._minvT, "val": self._val, "lcol": self._lcol}

    def solve_permuted(self, arrs, b3d):
        """b3d: (num_blocks*64, SUB) packed via b_to_b3d -> x2d_m."""
        x2d, _acc = self._call(arrs["wr"], arrs["ob"], arrs["qg"],
                               arrs["fin"], arrs["bfirst"], arrs["dense"],
                               arrs["dblk"], b3d, arrs["val"], arrs["lcol"],
                               arrs["minvT"])
        return x2d

    def b_to_b3d(self, b: np.ndarray) -> np.ndarray:
        """Host-side pack of (n, k<=8) RHS into the block-tile b3d (same
        lane layout as x2d_m rows): b3d[blk*8 + kk, l] = b[row of slot
        blk*128 + l, kk], head slots pre-scaled by 1/diag (dense raw)."""
        lay = self.layout
        n, nb = lay.n, lay.num_blocks
        k = b.shape[1]
        if k > self.MAX_RHS:
            raise ValueError(f"k={k} exceeds MAX_RHS={self.MAX_RHS}")
        bp = np.zeros((nb * 128, self.MAX_RHS), dtype=np.float32)
        bp[np.asarray(lay.slot_of_row), :k] = np.asarray(b, np.float32)
        # inv_diag is (nb*8, SUB): flattens to per-slot order
        scale = np.asarray(lay.inv_diag).reshape(-1)   # (nb*128,)
        bp *= scale[:, None]
        # (nb*128, 8) -> (nb, 128, 8) -> (nb, 8, 128) -> (nb*8, 128)
        return np.ascontiguousarray(
            bp.reshape(nb, 128, self.MAX_RHS).transpose(0, 2, 1)
        ).reshape(nb * SUBLANES, LANES)

    def x2d_to_x(self, x2d: np.ndarray, k: int) -> np.ndarray:
        """Host-side unpack: x[row, kk] = x2d[(slot//128)*8 + kk,
        slot % 128]."""
        lay = self.layout
        slots = np.asarray(lay.slot_of_row)
        x2d = np.asarray(x2d)
        out = np.empty((lay.n, k), dtype=self.dtype)
        for kk in range(k):
            out[:, kk] = x2d[(slots // 128) * 8 + kk, slots % 128]
        return out
