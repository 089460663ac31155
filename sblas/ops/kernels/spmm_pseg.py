"""Pallas TPU SpMM kernel over the PSEG layout (scattered/power-law SpMM —
the SpMM half of BASELINE config #5's graph workloads).

Same rounds as spmv_pseg — including the HYBRID hub+tail packing and the
heavy-row split (a plain win2 pack of a Zipf graph shatters: the
powerlaw-1M SpMM crashed the compiler on ~2M rounds of prefetch scalars
before this executor shared spmv_pseg's packing). Per round the kernel
loops over the K dense columns (X staged in VMEM transposed as
Xt[kc, x2d_rows, 128]), gathering each column's window and scattering the
(8,128) partial into that column's block of the stacked (kc*y_rows, 128)
VMEM output. K is chunked so Xt + Y together stay inside VMEM (m=1M means
kc=1: k passes over the schedule — gather-bound but correct).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_pseg import pack_pseg, pack_pseg_hybrid, SUBLANES, LANES
from .spmv_pseg import hub_relabel, split_heavy_rows

# k-resident executor geometry defaults: output y-group block (kc * _BPG
# blocks of 8 sublane-rows) and tail-Xt chunk (kc, _CH, 128) (x2 pipeline
# buffers) together stay under the measured 14.5 MiB VMEM compile ceiling
# (spmm_bsr_pallas._VMEM_T_LIMIT) with th=256 schedule tiles.  The real
# executor sizes (bpg, ch, kc) adaptively per matrix (_pick_kres_geometry):
# every (y group, Xt chunk) transition pads the schedule to a whole tile,
# so G*C must stay small relative to the round count.
_BPG = 256          # 1024-row blocks per y group (test/default geometry)
_CH = 256           # x2d panels per streamed tail-Xt chunk (multiple of 16)
_KRES_VMEM_BUDGET = int(12.5 * (1 << 20))   # out block + 2 Xt chunk buffers
# v5e SMEM is a HARD 1.00 MiB (e36: powerlaw-1M's single 126048-round tail
# range compiled to "Used 1.00M of 1.00M smem. Exceeded smem capacity by
# 1.1K" — 2 x 496K (wr, ob) + 2 x 16K per-tile scalars + ~1K compiler
# slots). The cap must be byte-exact AND th-aware: a blunt 112K-round cap
# shrank uk-2002-full's kc=1 geometry (smaller per-group budget -> bpg
# halved -> more groups -> more pad tiles + Xt re-stages) and doubled its
# SpMV wall clock (66.8 vs 34.8 ms, round-11 measurement).
_SMEM_BYTES = 1 << 20
_SMEM_ROUND_CAP = None   # test override; None -> byte-exact per ns
# Plan-time HBM guard (round 11): uk-2002-full's kh=8 kres plan prices
# 8.34 GB of range-padded schedule + 1.9 GB of live per-range y buffers +
# 0.6 GB Xt — RESOURCE_EXHAUSTED on a 16 GiB chip once X/Y/feedback join.
# Reject at plan build (ValueError) so auto routes to spmv_passes over the
# kc=1 SpMV plan (7.4 GB, fits) instead of dying at dispatch.
_KRES_HBM_BUDGET = 10 * (1 << 30)


def _smem_round_cap(ns: int) -> int:
    """Max rounds per range whose prefetch scalars fit SMEM: (wr, ob) are
    s32 per ROUND, (yg, ck) s32 per TILE (= ns rounds), operands padded to
    4 KiB; 64 KiB margin covers the paddings plus the compiler's own
    scoped slots. th=256 (ns=32) -> ~119K rounds; th=1024 -> ~122K."""
    if _SMEM_ROUND_CAP is not None:
        return _SMEM_ROUND_CAP
    return int((_SMEM_BYTES - 64 * 1024) // (8 * (1 + 1.0 / ns)))
# Mosaic double-buffers the y-group OUTPUT block as well as the inputs, so
# the true scoped-VMEM footprint is ~2*out + 2*chunk + tiles ≈ 1.5x the
# picker's budget — past XLA's default 16 MiB scoped limit at K=32 (uk-2002
# @0.05 hit 19.25M and failed remote-compile).  v5e has 128 MiB VMEM; raise
# the per-kernel limit instead of shrinking the geometry (smaller groups =
# more pad segments = more streamed bytes).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * (1 << 20))


def _pick_kres_geometry(w, kh: int):
    """Choose (kc, bpg, ch) for the k-resident executor.

    VMEM holds the y-group block (kc*bpg*4096 B) plus two pipeline buffers
    of the tail-Xt chunk (2*kc*ch*512 B); under that linear budget the
    segment count G*C = (blocks/bpg)*(panels/ch) is minimized by splitting
    the budget evenly between the two (AM-GM).  Each (group, chunk) segment
    pads to a whole tile, so smaller kc (fewer, larger chunks — more
    schedule passes) can beat kc=kh on web-scale matrices where G*C
    explodes; the sweep scores each kc by measured distinct-segment counts
    on the actual packed streams."""
    ns = w.th // SUBLANES
    nrounds = len(w.round_wrow)
    h0 = w.n_hub_rounds if w.n_hub_rounds >= 0 else nrounds
    num_blocks = max(w.y_rows // SUBLANES, 1)
    oblk = np.asarray(w.round_oblk, dtype=np.int64)
    wrow = np.asarray(w.round_wrow, dtype=np.int64)
    best = None
    for kc in range(kh, 0, -1):
        half = _KRES_VMEM_BUDGET // 2
        bpg = max(half // (kc * SUBLANES * LANES * 4), 1)
        ch = max((half // (2 * kc * LANES * 4)) // 16 * 16, 16)
        G = -(-num_blocks // bpg)
        g_h = oblk[:h0] // bpg
        g_t = oblk[h0:] // bpg
        ck_t = wrow[h0:] // ch
        segs = (len(np.unique(g_h))
                + len(np.unique((g_t << 32) + ck_t)) + 2 * G)
        passes = -(-kh // kc)
        # bytes score: passes over (real rounds + expected pad rounds)
        score = passes * (nrounds + segs * (ns - 1) / 2)
        if best is None or score < best[0]:
            best = (score, kc, bpg, ch)
    kc, bpg, ch = best[1], best[2], best[3]
    # degree-sorted rows concentrate rounds in the first groups (uk-2002:
    # group 0 alone blew the SMEM cap at bpg=1600) — shrink bpg until every
    # group's POST-PAD round estimate fits a range (the range splitter can
    # isolate one group per range, so that is the binding constraint), and
    # give the freed VMEM back to the chunk size. The estimate prices each
    # (group, chunk) segment's whole-tile padding (ns-1 rounds worst case);
    # ch only grows after this loop, so the estimate is conservative.
    cap = _smem_round_cap(ns)
    while bpg > 1:
        Gc = -(-num_blocks // bpg)
        g_h = oblk[:h0] // bpg
        g_t = oblk[h0:] // bpg
        est_h = np.bincount(g_h, minlength=Gc) + (ns - 1)
        est_t = np.bincount(g_t, minlength=Gc).astype(np.int64)
        if len(g_t):
            uk = np.unique((g_t.astype(np.int64) << 32)
                           + (wrow[h0:] // ch))
            est_t += np.bincount((uk >> 32).astype(np.int64),
                                 minlength=Gc) * (ns - 1)
        if (int(est_h.max(initial=0)) <= cap
                and int(est_t.max(initial=0)) <= cap):
            break
        bpg //= 2
    free = _KRES_VMEM_BUDGET - kc * bpg * SUBLANES * LANES * 4
    ch = max((free // (2 * kc * LANES * 4)) // 16 * 16, 16)
    ch = min(ch, max(-(-w.x2d_rows // 16) * 16, 16))
    return kc, bpg, ch


def _kernel(th, kc, y_rows, tail: bool = False):
    ns = th // SUBLANES

    def kern(wrow_ref, oblk_ref, xt_ref, val_ref, col_ref, tsb_ref, out_ref):
        t = pl.program_id(0)

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
            sel = c < 128
            masks = [(tsb == ts).astype(jnp.float32)
                     for ts in range(SUBLANES)]
            for kk in range(kc):
                if tail:
                    # panel-bound tail rounds: slot sublane s reads panel
                    # w+s (lcol < 128) or w+8+s — two direct (8,128) slices
                    x8a = xt_ref[kk, pl.ds(w, SUBLANES), :]
                    x8b = xt_ref[kk, pl.ds(w + SUBLANES, SUBLANES), :]
                    g0 = jnp.take_along_axis(x8a, c0, axis=1)
                    g1 = jnp.take_along_axis(x8b, c1, axis=1)
                else:
                    xw = xt_ref[kk, pl.ds(w, 1), :]
                    table = jnp.broadcast_to(xw, (SUBLANES, 128))
                    xw1 = xt_ref[kk, pl.ds(w + 1, 1), :]
                    table1 = jnp.broadcast_to(xw1, (SUBLANES, 128))
                    g0 = jnp.take_along_axis(table, c0, axis=1)
                    g1 = jnp.take_along_axis(table1, c1, axis=1)
                g = jnp.where(sel, g0, g1)
                p = v * g
                parts = [jnp.sum(p * mk, axis=0, keepdims=True)
                         for mk in masks]
                outb = jnp.concatenate(parts, axis=0)      # (8, 128)
                slab = kk * y_rows + b * SUBLANES
                cur = out_ref[pl.ds(slab, SUBLANES), :]
                out_ref[pl.ds(slab, SUBLANES), :] = cur + outb

    return kern


def _regroup_kres(w, bpg: int, ch: int):
    """Re-sort + pad the hybrid PSEG schedule for the k-resident executor.

    Output y is processed in GROUPS of ``bpg`` 1024-row blocks (so kc=8 RHS
    planes of one group fit VMEM at any m) and tail x is streamed in ``ch``
    -panel chunks; a tile must therefore be homogeneous in (group, chunk,
    hub/tail).  Rounds are stably sorted by group (hub) / (group, chunk)
    (tail) — the packer's intra-segment order is irrelevant because every
    round only accumulates into its own (block, ts) slab — and each segment
    is padded with zero rounds to a whole tile.  Tail ``wrow`` is localized
    to its chunk (w - ck*ch, still a multiple of 16 — the Mosaic dynamic
    sublane-slice alignment rule, retile_pseg.py).  Every group gets at
    least one tile in BOTH streams so every output block is zero-initialized
    and written exactly once (pallas revisit semantics).
    """
    ns = w.th // SUBLANES
    nrounds = len(w.round_wrow)
    h0 = w.n_hub_rounds if w.n_hub_rounds >= 0 else nrounds
    nz = (w.val != 0).reshape(nrounds, -1).any(axis=1)
    num_blocks = w.y_rows // SUBLANES
    G = -(-num_blocks // bpg)
    xrows_pad = -(-w.x2d_rows // ch) * ch

    wrow_p = np.append(w.round_wrow, 0).astype(np.int64)
    oblk_p = np.append(w.round_oblk, 0).astype(np.int64)
    # one shared pad round at index ``nrounds`` (hoisted: these are full
    # copies of the ~100s-of-MB schedule at web-graph scale)
    valp = np.vstack([w.val, np.zeros((SUBLANES, LANES), w.val.dtype)])
    lcolp = np.vstack([w.lcol, np.zeros((SUBLANES, LANES), w.lcol.dtype)])
    tsbp = np.vstack([w.tsb, np.zeros((SUBLANES, LANES), w.tsb.dtype)])

    def build(r_idx, with_chunk):
        g = oblk_p[r_idx] // bpg
        if with_chunk:
            ck = wrow_p[r_idx] // ch
            order = np.argsort(g * (xrows_pad // ch) + ck, kind="stable")
        else:
            ck = np.zeros(len(r_idx), dtype=np.int64)
            order = np.argsort(g, kind="stable")
        r_idx, g, ck = r_idx[order], g[order], ck[order]
        segs = []                    # (g, ck, padded round-index array)
        key = g * (1 << 32) + ck
        if len(key):
            bounds = np.flatnonzero(
                np.concatenate([[True], key[1:] != key[:-1]]))
            bounds = np.append(bounds, len(key))
        else:
            bounds = np.zeros(1, dtype=np.int64)
        covered = set()
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            pad = (-(s1 - s0)) % ns
            arr = np.concatenate(
                [r_idx[s0:s1], np.full(pad, nrounds, dtype=np.int64)])
            segs.append((int(g[s0]), int(ck[s0]), arr))
            covered.add(int(g[s0]))
        for gg in range(G):          # empty groups still need one pad tile
            if gg not in covered:
                segs.append((gg, 0, np.full(ns, nrounds, dtype=np.int64)))
        # group order must be non-decreasing over segments (revisit rule)
        segs.sort(key=lambda s: (s[0], s[1]))
        seg_g = [s[0] for s in segs]
        seg_ck = [s[1] for s in segs]
        seg_len = [len(s[2]) for s in segs]
        src = np.concatenate([s[2] for s in segs])
        tiles = len(src) // ns
        rows = (src[:, None] * SUBLANES
                + np.arange(SUBLANES)[None, :]).ravel()
        ck_r = np.repeat(np.asarray(seg_ck, np.int64),
                         np.asarray(seg_len))
        g_r = np.repeat(np.asarray(seg_g, np.int64),
                        np.asarray(seg_len))
        wr = wrow_p[src] - ck_r * ch          # chunk-local (pads -> 0)
        ob = oblk_p[src] - g_r * bpg          # group-local (pads -> 0)
        ob[src == nrounds] = 0
        wr[src == nrounds] = 0
        i32 = np.int32
        return {
            "val": valp[rows], "lcol": lcolp[rows], "tsb": tsbp[rows],
            "wr": wr.astype(i32), "ob": ob.astype(i32),
            "yg": g_r[::ns].astype(i32), "ck": ck_r[::ns].astype(i32),
            "tiles": tiles,
        }

    hub = build(np.flatnonzero(nz[:h0]), with_chunk=False)
    tail = build(h0 + np.flatnonzero(nz[h0:]), with_chunk=True)
    return hub, tail, G, xrows_pad


def _split_kres_ranges(hub, tail, G, ns, cap_rounds):
    """Partition the group sequence into contiguous ranges so that each
    range's per-stream (wr, ob) prefetch scalars stay under the measured
    ~1.2 MB SMEM compile ceiling (DESIGN.md round-5 table).  Every range is
    padded to a COMMON (tile count, group span) so ONE compiled kernel per
    stream serves all ranges; ranges are cut near even round counts to
    bound that padding.  Returns (ranges, gspan): ranges is a list of
    (hub_r, tail_r, g0, g1) with group-LOCAL yg."""
    cap_tiles = max(cap_rounds // ns, 1)
    hcnt = np.bincount(hub["yg"], minlength=G).astype(np.int64)
    tcnt = np.bincount(tail["yg"], minlength=G).astype(np.int64)
    if int(hcnt.max()) > cap_tiles or int(tcnt.max()) > cap_tiles:
        raise ValueError("one y group alone exceeds the SMEM round cap")
    R = int(max(-(-hcnt.sum() // cap_tiles), -(-tcnt.sum() // cap_tiles), 1))
    soft_h = max(-(-int(hcnt.sum()) // R), 1)
    soft_t = max(-(-int(tcnt.sum()) // R), 1)
    cuts = [0]
    h = t = 0
    for g in range(G):
        if (h + hcnt[g] > soft_h or t + tcnt[g] > soft_t) and g > cuts[-1]:
            cuts.append(g)
            h = t = 0
        h += int(hcnt[g])
        t += int(tcnt[g])
    cuts.append(G)
    spans = list(zip(cuts[:-1], cuts[1:]))
    gspan = max(g1 - g0 for g0, g1 in spans)

    def tile_span(s, g0, g1):
        return (int(np.searchsorted(s["yg"], g0)),
                int(np.searchsorted(s["yg"], g1)))

    max_h = max(hi - lo for lo, hi in (tile_span(hub, g0, g1)
                                       for g0, g1 in spans))
    max_t = max(hi - lo for lo, hi in (tile_span(tail, g0, g1)
                                       for g0, g1 in spans))
    if max_h > cap_tiles or max_t > cap_tiles:
        raise ValueError("range splitting could not satisfy the SMEM cap")

    def slice_stream(s, g0, g1, max_tiles, with_chunk):
        # tiles are group-sorted: the range is one contiguous tile span
        lo, hi = tile_span(s, g0, g1)
        pad = max_tiles - (hi - lo)
        th_rows = ns * SUBLANES
        out = {
            "val": np.concatenate(
                [s["val"][lo * th_rows: hi * th_rows],
                 np.zeros((pad * th_rows, LANES), s["val"].dtype)]),
            "lcol": np.concatenate(
                [s["lcol"][lo * th_rows: hi * th_rows],
                 np.zeros((pad * th_rows, LANES), s["lcol"].dtype)]),
            "tsb": np.concatenate(
                [s["tsb"][lo * th_rows: hi * th_rows],
                 np.zeros((pad * th_rows, LANES), s["tsb"].dtype)]),
            "wr": np.concatenate(
                [s["wr"][lo * ns: hi * ns],
                 np.zeros(pad * ns, s["wr"].dtype)]),
            "ob": np.concatenate(
                [s["ob"][lo * ns: hi * ns],
                 np.zeros(pad * ns, s["ob"].dtype)]),
            # pad tiles keep the LAST real group (non-decreasing yg; they
            # only add zeros) — every group owns >=1 tile, so hi > lo
            "yg": np.concatenate(
                [s["yg"][lo:hi] - g0,
                 np.full(pad, int(s["yg"][hi - 1]) - g0, s["yg"].dtype)]),
            "tiles": max_tiles,
        }
        if with_chunk:
            out["ck"] = np.concatenate(
                [s["ck"][lo:hi], np.zeros(pad, s["ck"].dtype)])
        return out

    ranges = [
        (slice_stream(hub, g0, g1, max_h, False),
         slice_stream(tail, g0, g1, max_t, True), g0, g1)
        for g0, g1 in spans
    ]
    return ranges, gspan


def _kernel_kres(th, kc, gy_rows, tail: bool):
    """k-resident round body: identical math to ``_kernel`` but scattering
    into a GROUP-local (kc*gy_rows, 128) output block that is re-zeroed when
    the per-tile group scalar changes (consecutive revisit semantics)."""
    ns = th // SUBLANES

    def kern(wr_ref, ob_ref, yg_ref, *rest):
        if tail:
            ck_ref, xt_ref, val_ref, col_ref, tsb_ref, out_ref = rest
            del ck_ref   # consumed by the Xt BlockSpec index_map
        else:
            xt_ref, val_ref, col_ref, tsb_ref, out_ref = rest
        t = pl.program_id(0)
        prev = yg_ref[jnp.maximum(t - 1, 0)]
        first = jnp.logical_or(t == 0, yg_ref[t] != prev)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for i in range(ns):
            w = wr_ref[t * ns + i]
            b = ob_ref[t * ns + i]
            v = val_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                jnp.float32)
            c = col_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(jnp.int32)
            tsb = tsb_ref[i * SUBLANES:(i + 1) * SUBLANES, :].astype(
                jnp.int32)
            c0 = jnp.minimum(c, 127)
            c1 = jnp.maximum(c - 128, 0)
            sel = c < 128
            masks = [(tsb == ts).astype(jnp.float32)
                     for ts in range(SUBLANES)]
            for kk in range(kc):
                if tail:
                    x8a = xt_ref[kk, pl.ds(w, SUBLANES), :]
                    x8b = xt_ref[kk, pl.ds(w + SUBLANES, SUBLANES), :]
                    g0 = jnp.take_along_axis(x8a, c0, axis=1)
                    g1 = jnp.take_along_axis(x8b, c1, axis=1)
                else:
                    xw = xt_ref[kk, pl.ds(w, 1), :]
                    table = jnp.broadcast_to(xw, (SUBLANES, 128))
                    xw1 = xt_ref[kk, pl.ds(w + 1, 1), :]
                    table1 = jnp.broadcast_to(xw1, (SUBLANES, 128))
                    g0 = jnp.take_along_axis(table, c0, axis=1)
                    g1 = jnp.take_along_axis(table1, c1, axis=1)
                g = jnp.where(sel, g0, g1)
                p = v * g
                parts = [jnp.sum(p * mk, axis=0, keepdims=True)
                         for mk in masks]
                outb = jnp.concatenate(parts, axis=0)      # (8, 128)
                slab = kk * gy_rows + b * SUBLANES
                cur = out_ref[pl.ds(slab, SUBLANES), :]
                out_ref[pl.ds(slab, SUBLANES), :] = cur + outb

    return kern


# Persist the full kres build (relabel -> heavy-row split -> hybrid pack ->
# geometry -> regroup -> range split) above this nnz: the chain is host
# numpy, deterministic given (matrix digest, th, kh, caps), and costs
# minutes at web scale — uk-2002-full's r10 "warm" SpmvPlan was 407 s
# because only the pack step was cached (VERDICT r4 item 1's 120 s bar).
_KRES_CACHE_MIN_NNZ = 5_000_000


class _KresNotApplicable(Exception):
    """Raised inside the cached-bundle builder when the auto decision says
    whole-VMEM / non-hybrid; the caller falls through to the uncached path."""


class _KresLayoutStats:
    """Stand-in for a PsegLayout on kres cache hits — carries exactly the
    fields the executor (th, n_stragglers), bench drivers (fill, num_tiles,
    th), and the SpMM routing model (bytes_per_iter, val.size) read."""

    class _Arr:
        __slots__ = ("size",)

        def __init__(self, size):
            self.size = int(size)

    def __init__(self, th, x2d_rows, y_rows, fill, bytes_per_iter,
                 n_stragglers, n_hub_rounds, num_tiles, val_size):
        self.th = int(th)
        self.x2d_rows = int(x2d_rows)
        self.y_rows = int(y_rows)
        self.fill = float(fill)
        self.bytes_per_iter = float(bytes_per_iter)
        self.n_stragglers = int(n_stragglers)
        self.n_hub_rounds = int(n_hub_rounds)
        self.num_tiles = int(num_tiles)
        self.val = self._Arr(val_size)


def _check_kres_hbm(tiles_total, th, vsz, nranges, gspan, kc, gy, xrp):
    """ValueError when the kres device plan cannot fit HBM next to its
    working set: padded schedule streams + all ranges' live y buffers +
    the staged Xt (see _KRES_HBM_BUDGET note)."""
    dev = (tiles_total * th * LANES * (vsz + 4)          # val+lcol+tsb
           + nranges * gspan * kc * gy * LANES * 4       # per-call y bufs
           + kc * xrp * LANES * 4)                       # Xt
    if dev > _KRES_HBM_BUDGET:
        raise ValueError(
            f"kres device plan ~{dev / (1 << 30):.1f} GiB exceeds the "
            f"{_KRES_HBM_BUDGET / (1 << 30):.0f} GiB HBM budget; "
            "use spmv_passes")


def _build_kres_bundle(a: CSR, th: int, kh: int) -> dict:
    """Cold build of the flat kres-plan bundle for plan_cache.cached_arrays.

    Raises _KresNotApplicable when the auto route would pick the whole-VMEM
    executor (kh <= kc_whole) or the hybrid pack is unavailable — those
    cases take the uncached __init__ path unchanged."""
    m, n = a.shape
    ap, colperm, rowperm = hub_relabel(a)
    ap, vown = split_heavy_rows(ap)
    m2 = ap.shape[0]
    w = pack_pseg_hybrid(ap, th=th)
    if w is None or w.n_hub_rounds < 0:
        raise _KresNotApplicable("no hybrid pack")
    per_k = (w.x2d_rows + w.y_rows) * LANES * 4
    # stored for the LOAD-time auto decision (kres=None callers ignore the
    # bundle when the whole-VMEM chunk already serves kh; forced kres=True
    # callers — e.g. pseg_big SpMV at kh=1 — use it regardless)
    kc_whole = int(max(min(12 * (1 << 20) // per_k, 8), 1))
    kc, bpg, ch = _pick_kres_geometry(w, kh)
    hub, tail, G, xrp = _regroup_kres(w, bpg, ch)
    ns = w.th // SUBLANES
    ranges, gspan = _split_kres_ranges(hub, tail, G, ns,
                                       _smem_round_cap(ns))
    del hub, tail
    store = {
        "colperm": np.asarray(colperm, dtype=np.int64),
        "rowperm": np.asarray(rowperm, dtype=np.int64),
        "srow": np.asarray(w.s_rows),
        "scol": np.asarray(w.s_cols),
        "sval": np.asarray(w.s_vals),
    }
    if vown is not None:
        store["vown"] = np.asarray(vown, dtype=np.int32)
    rmeta = []
    tiles_total = 0
    xt_stages = 0
    for i, (hub_r, tail_r, g0, g1) in enumerate(ranges):
        ht, tt = hub_r.pop("tiles"), tail_r.pop("tiles")
        tiles_total += ht + tt
        xt_stages += len(np.unique(
            (tail_r["ck"].astype(np.int64) << 32) + tail_r["yg"]))
        rmeta.append((ht, tt, g0, g1))
        for kk, v in hub_r.items():
            store[f"r{i}h_{kk}"] = v
        for kk, v in tail_r.items():
            store[f"r{i}t_{kk}"] = v
    store["rmeta"] = np.asarray(rmeta, dtype=np.int64)
    store["meta"] = np.asarray(
        [1, m2, m2 - m, kc, ch, G, bpg * SUBLANES, xrp, gspan, w.th,
         w.x2d_rows, w.y_rows, w.n_stragglers, w.n_hub_rounds, w.num_tiles,
         w.val.size, len(ranges), tiles_total, xt_stages, kc_whole],
        dtype=np.int64)
    store["metaf"] = np.asarray([w.fill, float(w.bytes_per_iter)],
                                dtype=np.float64)
    return store


class PallasSpmmScattered:
    """PSEG Pallas SpMM executor with hub relabeling (single chip)."""

    def __init__(self, a: CSR, *, th: int = 256, min_fill: float = 0.10,
                 reorder: bool = True, value_dtype=None,
                 hybrid: bool | None = None, k_hint: int | None = None,
                 kres: bool | None = None,
                 kres_geo: tuple | None = None):
        if a.dtype == np.float64:
            raise ValueError("Mosaic has no f64; use the XLA path for fp64")
        from .spmv_pallas import check_value_dtype
        from ...utils.backend import on_cpu

        value_dtype = check_value_dtype(value_dtype)
        self.value_dtype = value_dtype
        m, n = a.shape
        # Persistent kres-plan cache (round 11): at web scale the host
        # chain below costs minutes and is deterministic given (digest, th,
        # kh, caps) — warm hits restore the packed ranges straight from
        # mmap. Misses that raise _KresNotApplicable (auto route says
        # whole-VMEM) fall through to the uncached path unchanged.
        if (kres is not False and kres_geo is None and reorder
                and hybrid is not False and a.nnz >= _KRES_CACHE_MIN_NNZ
                and not on_cpu()):
            from ... import plan_cache

            if plan_cache.cache_enabled():
                kh0 = min(k_hint or 8, SUBLANES)
                params = {"v": 2, "th": th, "kh": kh0,
                          "cap": (_SMEM_ROUND_CAP if _SMEM_ROUND_CAP
                                  is not None else "byte-exact-v2"),
                          "vmem": _KRES_VMEM_BUDGET}
                try:
                    d = plan_cache.cached_arrays(
                        a, "psegk", params,
                        lambda: _build_kres_bundle(a, th, kh0))
                except _KresNotApplicable:
                    d = None
                if (d is not None and kres is None
                        and kh0 <= int(np.asarray(d["meta"])[19])):
                    d = None   # auto route: whole-VMEM chunk serves kh
                if d is not None:
                    self._restore_kres(a, d, k_hint, min_fill)
                    return
        if reorder:
            ap, colperm, rowperm = hub_relabel(a)
        else:
            colperm = np.arange(n, dtype=np.int64)
            rowperm = np.arange(m, dtype=np.int64)
            ap = a
        # mega-rows shatter the round packing (see spmv_pseg); deal them
        # into virtual sub-rows merged per column at readout
        ap, vown = split_heavy_rows(ap)
        self._m2 = ap.shape[0]
        self.n_virtual = self._m2 - m
        self._vown = (jnp.asarray(vown.astype(np.int32))
                      if vown is not None else None)
        if hybrid is None:
            hybrid = not on_cpu()
        w = None
        if hybrid:
            w = pack_pseg_hybrid(ap, th=th)
        if w is None:
            w = pack_pseg(ap, th=th)
        if w.fill < min_fill:
            raise ValueError(
                f"PSEG fill {w.fill:.2f} below {min_fill}; use the XLA path"
            )
        self.layout = w
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        self.bytes_per_iter = (w.bytes_per_iter   # per K-chunk pass
                               - w.val.size * (4 - value_dtype.itemsize))
        self.colperm = colperm
        self.rowperm = rowperm
        self._colperm = jnp.asarray(colperm.astype(np.int32))
        inv_row = np.empty(m, dtype=np.int64)
        inv_row[rowperm] = np.arange(m)
        self._rowperm_inv = jnp.asarray(inv_row.astype(np.int32))
        # k-resident mode (round 6): when the whole-VMEM kc chunk is smaller
        # than the requested k (kc=1 at m=1M meant k full schedule passes =
        # 8.3x SpMV on powerlaw-1M), regroup the schedule by (y group, Xt
        # chunk) so ONE pass serves all kc<=8 RHS: the output y-group block
        # rides a per-tile prefetch scalar, tail Xt streams in _CH-panel
        # chunks. Requires the hybrid pack (hub windows must sit in chunk 0).
        # kernel chunk width caps at SUBLANES; larger k (e.g. 32) runs
        # ceil(k/kc) passes in apply_permuted — the bytes models below must
        # scale by the FULL requested k, not the capped chunk (a K=32 plan
        # priced at one 8-wide pass would overstate pct_stream 4x)
        k_full = k_hint or 8
        kh = min(k_full, SUBLANES)
        if kres is None:
            kres = (w.n_hub_rounds >= 0 and kh > self._k_chunk())
        self._kres = bool(kres)
        if self._kres:
            if w.n_hub_rounds < 0:
                raise ValueError("k-resident PSEG SpMM needs a hybrid pack")
            ns = w.th // SUBLANES
            if kres_geo is None:
                kres_geo = _pick_kres_geometry(w, kh)
            self._kc, bpg, ch = kres_geo
            self._ch = ch
            hub, tail, G, xrp = _regroup_kres(w, bpg, ch)
            ranges, gspan = _split_kres_ranges(hub, tail, G, ns,
                                               _smem_round_cap(ns))
            del hub, tail
            _check_kres_hbm(
                sum(h["tiles"] + t["tiles"] for h, t, _, _ in ranges),
                w.th, value_dtype.itemsize, len(ranges), gspan, self._kc,
                bpg * SUBLANES, xrp)
            self._kres_geo = (G, bpg * SUBLANES, xrp, gspan)
            self._kranges = []
            tiles_total = 0
            xt_stages = 0
            for hub_r, tail_r, g0, g1 in ranges:
                ht, tt = hub_r.pop("tiles"), tail_r.pop("tiles")
                tiles_total += ht + tt
                xt_stages += len(np.unique(
                    (tail_r["ck"].astype(np.int64) << 32) + tail_r["yg"]))
                hub_r["val"] = hub_r["val"].astype(value_dtype)
                tail_r["val"] = tail_r["val"].astype(value_dtype)
                self._kranges.append((
                    {kk: jnp.asarray(v) for kk, v in hub_r.items()},
                    {kk: jnp.asarray(v) for kk, v in tail_r.items()},
                    ht, tt, g0, g1))
            # one pass serves kc RHS (ceil(kh/kc) passes for kh): schedule
            # per pass + tail Xt re-staged per visited (chunk, group) + y
            # group blocks out
            passes = -(-k_full // self._kc)
            self.bytes_per_iter = passes * (
                tiles_total * w.th * LANES * (value_dtype.itemsize + 4)
                + xt_stages * ch * LANES * 4 * self._kc) \
                + G * k_full * bpg * SUBLANES * LANES * 4
        # hybrid stream: rounds [0, n_hub) are win2 hub tiles, the rest
        # panel-bound tail tiles (two branchless calls; see spmv_pseg)
        ns = w.th // SUBLANES
        if not self._kres:
            # whole-VMEM executor: ceil(k/kc) full schedule passes
            self.bytes_per_iter *= -(-k_full // self._k_chunk())
            if w.n_hub_rounds >= 0:
                self._tiles_h = max(w.n_hub_rounds // ns, 1)
            else:
                self._tiles_h = w.num_tiles
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
        self._calls = {}

    def _restore_kres(self, a: CSR, d: dict, k_hint, min_fill):
        """Populate a k-resident plan from a cached bundle (mmap or fresh).

        Mirrors the uncached kres branch of __init__: same device arrays,
        same bytes model (recomputed for the requested k/value_dtype from
        the stored tile/stage counts), same ValueError on low fill."""
        meta = np.asarray(d["meta"])
        (_ver, m2, n_virtual, kc, ch, G, gy, xrp, gspan, th, x2d_rows,
         y_rows, n_stragglers, n_hub_rounds, num_tiles, val_size, nranges,
         tiles_total, xt_stages, _kc_whole) = (int(x) for x in meta)
        fill, layout_bytes = (float(x) for x in np.asarray(d["metaf"]))
        if fill < min_fill:
            raise ValueError(
                f"PSEG fill {fill:.2f} below {min_fill}; use the XLA path")
        m, n = a.shape
        value_dtype = self.value_dtype
        _check_kres_hbm(tiles_total, th, value_dtype.itemsize, nranges,
                        gspan, kc, gy, xrp)
        self.layout = _KresLayoutStats(
            th, x2d_rows, y_rows, fill, layout_bytes, n_stragglers,
            n_hub_rounds, num_tiles, val_size)
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        self._m2 = m2
        self.n_virtual = n_virtual
        self._vown = (jnp.asarray(np.asarray(d["vown"]))
                      if n_virtual else None)
        colperm = np.asarray(d["colperm"])
        rowperm = np.asarray(d["rowperm"])
        self.colperm = colperm
        self.rowperm = rowperm
        self._colperm = jnp.asarray(colperm.astype(np.int32))
        inv_row = np.empty(m, dtype=np.int64)
        inv_row[rowperm] = np.arange(m)
        self._rowperm_inv = jnp.asarray(inv_row.astype(np.int32))
        self._kres = True
        self._kc = kc
        self._ch = ch
        self._kres_geo = (G, gy, xrp, gspan)
        rmeta = np.asarray(d["rmeta"])
        self._kranges = []
        for i in range(nranges):
            ht, tt, g0, g1 = (int(x) for x in rmeta[i])
            hub_r = {}
            for kk in ("val", "lcol", "tsb", "wr", "ob", "yg"):
                v = d[f"r{i}h_{kk}"]
                if kk == "val" and v.dtype != value_dtype:
                    v = np.asarray(v).astype(value_dtype)
                hub_r[kk] = jnp.asarray(v)
            tail_r = {}
            for kk in ("val", "lcol", "tsb", "wr", "ob", "yg", "ck"):
                v = d[f"r{i}t_{kk}"]
                if kk == "val" and v.dtype != value_dtype:
                    v = np.asarray(v).astype(value_dtype)
                tail_r[kk] = jnp.asarray(v)
            self._kranges.append((hub_r, tail_r, ht, tt, g0, g1))
        k_full = k_hint or 8
        passes = -(-k_full // kc)
        self.bytes_per_iter = passes * (
            tiles_total * th * LANES * (value_dtype.itemsize + 4)
            + xt_stages * ch * LANES * 4 * kc) \
            + G * k_full * gy * LANES * 4
        self._srow = jnp.asarray(np.asarray(d["srow"]))
        self._scol = jnp.asarray(np.asarray(d["scol"]))
        self._sval = jnp.asarray(np.asarray(d["sval"]))
        self._calls = {}

    def _k_chunk(self) -> int:
        # Xt (kc, x2d_rows, 128) + Y (kc*y_rows, 128) share one VMEM: size
        # kc against their SUM, not separate limits (m=1M: kc=2 under the
        # separate limits put 8+8 MB in VMEM and crashed the compiler;
        # kc=1 means k passes over the schedule — gather-bound but correct)
        w = self.layout
        budget = 12 * (1 << 20)   # leaves room for double-buffered tiles
        per_k = (w.x2d_rows + w.y_rows) * LANES * 4
        return int(max(min(budget // per_k, 8), 1))

    def _get_call(self, kc: int, num_tiles: int, *, tail: bool):
        key = (kc, tail)
        if key in self._calls:
            return self._calls[key]
        w = self.layout
        from ...utils.backend import on_cpu

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Xt chunk whole
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            _kernel(w.th, kc, w.y_rows, tail=tail),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((kc * w.y_rows, LANES),
                                           jnp.float32),
            compiler_params=_VMEM_LIMIT,
            interpret=on_cpu(),
        )
        self._calls[key] = call
        return call

    def _get_call_kres(self, kc: int, num_tiles: int, *, tail: bool):
        key = (kc, tail, "kres")
        if key in self._calls:
            return self._calls[key]
        w = self.layout
        from ...utils.backend import on_cpu

        G, gy, xrp, gspan = self._kres_geo
        tile = pl.BlockSpec((w.th, LANES), lambda t, *s: (t, 0))
        if tail:
            ch = self._ch
            in_specs = [
                # streamed tail-Xt chunk: per-TILE prefetch scalar picks the
                # ch-panel stage (same pattern as spmm_bsr_pallas streamed)
                pl.BlockSpec((kc, ch, LANES),
                             lambda t, wr, ob, yg, ck: (0, ck[t], 0)),
                tile, tile, tile,
            ]
            nsp = 4
        else:
            in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),  # hub Xt
                        tile, tile, tile]
            nsp = 3
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(num_tiles,),
            in_specs=in_specs,
            # y-group block rides the per-tile group scalar; tiles are
            # group-sorted so each block is visited once, consecutively
            out_specs=pl.BlockSpec((kc * gy, LANES),
                                   lambda t, wr, ob, yg, *rest: (yg[t], 0)),
        )
        call = pl.pallas_call(
            _kernel_kres(w.th, kc, gy, tail=tail),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((gspan * kc * gy, LANES),
                                           jnp.float32),
            compiler_params=_VMEM_LIMIT,
            interpret=on_cpu(),
        )
        self._calls[key] = call
        return call

    def device_arrays(self):
        d = {"srow": self._srow, "scol": self._scol, "sval": self._sval,
             "colperm": self._colperm, "rowinv": self._rowperm_inv}
        if self._kres:
            for r, (hub_r, tail_r, *_rest) in enumerate(self._kranges):
                d.update({f"kh{r}_{kk}": v for kk, v in hub_r.items()})
                d.update({f"kt{r}_{kk}": v for kk, v in tail_r.items()})
        else:
            d.update({"wr": self._wr, "ob": self._ob, "val": self._val,
                      "lcol": self._lcol, "tsb": self._tsb})
            if self._tiles_t:
                d.update({"wr_t": self._wr_t, "ob_t": self._ob_t,
                          "val_t": self._val_t, "lcol_t": self._lcol_t,
                          "tsb_t": self._tsb_t})
        if self.n_virtual:
            d["vown"] = self._vown
        return d

    def _epilogue(self, y, arrs, x_perm, k0, kw):
        """Stragglers + virtual-row merge + padded-row slice; y is
        (kc, y_rows*128) in hub-relabeled row space."""
        m = self.shape[0]
        y = y[:kw]
        if self.layout.n_stragglers:
            y = y.at[:, arrs["srow"]].add(
                arrs["sval"][None, :]
                * x_perm[arrs["scol"], k0:k0 + kw].T)
        yk = y[:, :m]
        if self.n_virtual:
            yk = yk.at[:, arrs["vown"]].add(y[:, m:self._m2])
        return yk.T

    def apply_permuted(self, arrs, x_perm):
        """Y_perm = A_perm @ X_perm, X/Y in hub-relabeled space."""
        if self._kres:
            return self._apply_kres(arrs, x_perm)
        n = self.shape[1]
        w = self.layout
        k = x_perm.shape[1]
        kc = self._k_chunk()
        pad = w.x2d_rows * 128 - n
        cols = []
        for k0 in range(0, k, kc):
            kw = min(kc, k - k0)
            xs = x_perm[:, k0:k0 + kw].astype(jnp.float32)
            if kw < kc:
                xs = jnp.pad(xs, ((0, 0), (0, kc - kw)))
            xt = jnp.pad(xs, ((0, pad), (0, 0)))
            xt = xt.reshape(w.x2d_rows, 128, kc).transpose(2, 0, 1)
            y = self._get_call(kc, self._tiles_h, tail=False)(
                arrs["wr"], arrs["ob"], xt,
                arrs["val"], arrs["lcol"], arrs["tsb"])
            if self._tiles_t:
                y = y + self._get_call(kc, self._tiles_t, tail=True)(
                    arrs["wr_t"], arrs["ob_t"], xt,
                    arrs["val_t"], arrs["lcol_t"], arrs["tsb_t"])
            y = y.reshape(kc, w.y_rows * 128)       # (kc, m2+pad)
            cols.append(self._epilogue(y, arrs, x_perm, k0, kw))
        y_perm = jnp.concatenate(cols, axis=1)           # (m, k)
        return y_perm.astype(self.dtype)

    def _apply_kres(self, arrs, x_perm):
        """One schedule pass serves all kc<=8 RHS (k-resident mode); the
        group sequence may be split over several (hub, tail) call pairs to
        respect the SMEM prefetch-scalar cap — all pairs share the two
        compiled kernels (common padded tile count and group span)."""
        n = self.shape[1]
        G, gy, xrp, gspan = self._kres_geo
        k = x_perm.shape[1]
        kc = min(k, self._kc)
        pad = xrp * 128 - n
        cols = []
        for k0 in range(0, k, kc):
            kw = min(kc, k - k0)
            xs = x_perm[:, k0:k0 + kw].astype(jnp.float32)
            if kw < kc:
                xs = jnp.pad(xs, ((0, 0), (0, kc - kw)))
            xt = jnp.pad(xs, ((0, pad), (0, 0)))
            xt = xt.reshape(xrp, 128, kc).transpose(2, 0, 1)
            xt_hub = xt[:, :SUBLANES, :]    # hub windows sit in panels 0..2
            parts = []
            for r, (_h, _t, ht, tt, g0, g1) in enumerate(self._kranges):
                y = self._get_call_kres(kc, ht, tail=False)(
                    arrs[f"kh{r}_wr"], arrs[f"kh{r}_ob"], arrs[f"kh{r}_yg"],
                    xt_hub, arrs[f"kh{r}_val"], arrs[f"kh{r}_lcol"],
                    arrs[f"kh{r}_tsb"])
                y = y + self._get_call_kres(kc, tt, tail=True)(
                    arrs[f"kt{r}_wr"], arrs[f"kt{r}_ob"], arrs[f"kt{r}_yg"],
                    arrs[f"kt{r}_ck"], xt, arrs[f"kt{r}_val"],
                    arrs[f"kt{r}_lcol"], arrs[f"kt{r}_tsb"])
                # rows past the real span are never-visited pad groups
                parts.append(y[: (g1 - g0) * kc * gy])
            y = jnp.concatenate(parts).reshape(G, kc, gy * 128)
            y = y.transpose(1, 0, 2).reshape(kc, G * gy * 128)
            cols.append(self._epilogue(y, arrs, x_perm, k0, kw))
        y_perm = jnp.concatenate(cols, axis=1)           # (m, k)
        return y_perm.astype(self.dtype)

    def apply_pure(self, arrs, x):
        x_perm = x[arrs["colperm"], :]
        y_perm = self.apply_permuted(arrs, x_perm)
        return y_perm[arrs["rowinv"], :]

    def apply_traced(self, x):
        return self.apply_pure(self.device_arrays(), x)

    def __call__(self, x, alpha, beta, y, with_y):
        out = self.apply_traced(x)
        out = alpha.astype(out.dtype) * out
        if with_y:
            out = out + beta.astype(out.dtype) * y
        return out
