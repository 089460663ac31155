"""Multi-chip SpTRSV (SURVEY.md C10 — the arXiv:2012.06959 capability).

Level-set wavefront across chips, with the two scalability optimizations
SURVEY.md §7 hard-part 5 calls for:

1. **Affinity-aware tile dealing.** Each level's tiles are assigned to chips
   preferring the chip that owns most of the tile's dependencies (quota:
   equal tiles per chip per level, for SPMD static shapes), instead of blind
   round-robin. This maximizes same-chip dependencies, which feeds:

2. **Level batching.** Consecutive levels whose cross-level dependencies are
   all chip-local fuse into one *batch*: each chip solves its tiles of the
   whole batch sequentially against its locally-updated x (intra-chip deps
   resolve by tile order), and only ONE exchange happens per batch.

3. **Shrunk exchange.** The exchange is an `all_gather` of just the batch's
   newly solved slot values ((ndev, batch_chunk) floats) scattered into the
   replicated x via a precomputed slot->row map — not a full-length-n psum
   per level. Total collective traffic is ~2x the padded solution size
   (∝ n), independent of level count; the old scheme moved n x nlevels.

Batches are grouped into a handful of *segments* of similar chunk size so
each `lax.fori_loop` runs with static shapes while padding waste stays
bounded (chunk within a segment varies ≤2x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..formats import CSR, INDEX_DTYPE
from ..sptrsv_schedule import build_level_schedule
from .mesh import make_mesh, chips_axis


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _deal_tiles(sched, ndev, lower):
    """Assign each level's tiles to chips by dependency affinity.

    Returns (tile_chip (num_tiles,), chip_of_row (n,)): every level keeps an
    equal per-chip tile quota (tiles_per_level padded up to ndev)."""
    n = sched.n
    tr = sched.tile_rows
    lot = sched.level_of_tile
    tiles_per_level = np.bincount(lot, minlength=sched.nlevels)
    tile_chip = np.full(sched.num_tiles, -1, dtype=np.int64)
    chip_of_row = np.full(n + 2, -1, dtype=np.int64)

    # slot -> row map per tile
    slot_row = sched.slot_row.astype(np.int64)
    col = sched.col.astype(np.int64)

    t_base = 0
    for lv in range(sched.nlevels):
        t_real = int(tiles_per_level[lv])
        quota_total = _round_up(max(t_real, 1), ndev)
        quota = quota_total // ndev
        remaining = np.full(ndev, quota, dtype=np.int64)
        if lv == 0 or t_real == 0:
            order = np.arange(t_real)
            scores = np.zeros((t_real, ndev), dtype=np.int64)
        else:
            # affinity: count deps from each tile's rows to each chip
            s0, s1 = t_base * tr, (t_base + t_real) * tr
            c_blk = col[s0:s1]                       # (t_real*tr, W)
            owner = chip_of_row[np.minimum(c_blk, n)]  # -1 for pads/self-lvl
            scores = np.zeros((t_real, ndev), dtype=np.int64)
            tile_ids = np.repeat(np.arange(t_real), tr * col.shape[1])
            flat_owner = owner.reshape(-1)
            valid = flat_owner >= 0
            np.add.at(scores, (tile_ids[valid], flat_owner[valid]), 1)
            # strongly-opinionated tiles pick first
            srt = np.sort(scores, axis=1)
            margin = srt[:, -1] - (srt[:, -2] if ndev > 1 else 0)
            order = np.argsort(-margin, kind="stable")
        for t in order:
            pref = np.argsort(-scores[t], kind="stable")
            for d in pref:
                if remaining[d] > 0:
                    tile_chip[t_base + t] = d
                    remaining[d] -= 1
                    rows = slot_row[(t_base + t) * tr:(t_base + t + 1) * tr]
                    live = rows < n
                    chip_of_row[rows[live]] = d
                    break
        t_base += t_real
    return tile_chip, tiles_per_level


def _make_batches(sched, tile_chip, tiles_per_level, ndev, l, lower):
    """Greedy level batching: extend the batch while every dependency whose
    source level is inside the batch is chip-local. Returns a list of
    (lv0, lv1) half-open level ranges."""
    n = sched.n
    levels = sched.levels.astype(np.int64)
    # chip of each row, from its tile
    tr = sched.tile_rows
    slot_row = sched.slot_row.astype(np.int64)
    chip_of_row = np.full(n, -1, dtype=np.int64)
    tile_of_slot = np.repeat(np.arange(sched.num_tiles), tr)
    live = slot_row < n
    chip_of_row[slot_row[live]] = tile_chip[tile_of_slot[live]]

    # min_start[lv]: the earliest level a batch containing lv may start at
    rows_nnz = l.row_ids().astype(np.int64)
    cols_nnz = l.indices.astype(np.int64)
    off = (cols_nnz < rows_nnz) if lower else (cols_nnz > rows_nnz)
    r, c = rows_nnz[off], cols_nnz[off]
    cross = chip_of_row[r] != chip_of_row[c]
    min_start = np.zeros(sched.nlevels, dtype=np.int64)
    if cross.any():
        np.maximum.at(min_start, levels[r[cross]], levels[c[cross]] + 1)
    min_start = np.maximum.accumulate(min_start)

    batches = []
    s = 0
    for lv in range(1, sched.nlevels):
        if min_start[lv] > s:
            batches.append((s, lv))
            s = lv
    batches.append((s, sched.nlevels))
    return batches


class DistSptrsvPlan:
    def __init__(self, l: CSR, mesh: Mesh | None = None, *,
                 lower: bool = True, unit_diagonal: bool = False,
                 tile_rows: int = 8):
        self.mesh = mesh or make_mesh()
        ndev = int(self.mesh.devices.size)
        self.ndev = ndev
        self.shape = l.shape
        self.dtype = l.dtype
        n = l.shape[0]

        sched = build_level_schedule(
            l, lower=lower, unit_diagonal=unit_diagonal, tile_rows=tile_rows
        )
        self.nlevels = sched.nlevels
        tr = sched.tile_rows
        self._tr = tr

        tile_chip, tiles_per_level = _deal_tiles(sched, ndev, lower)
        batches = _make_batches(sched, tile_chip, tiles_per_level, ndev, l,
                                lower)
        self.nbatches = len(batches)

        # per-chip tile quota per level, then per batch
        tpl_pad = _round_up(np.maximum(tiles_per_level, 1), ndev)
        tiles_per_chip_level = tpl_pad // ndev  # (L,)
        total_tiles_chip = int(tiles_per_chip_level.sum())
        S = total_tiles_chip * tr

        # Lay out chip-local slots: levels in order; within a level, the
        # chip's assigned tiles (affinity dealing), padded to quota.
        slot_row = np.full((ndev, S), n, dtype=INDEX_DTYPE)
        col = np.full((ndev, S, sched.width), n, dtype=INDEX_DTYPE)
        val = np.zeros((ndev, S, sched.width), dtype=l.data.dtype)
        inv_diag = np.ones((ndev, S), dtype=l.data.dtype)

        t_base = 0
        dst_tile = 0
        for lv in range(sched.nlevels):
            t_real = int(tiles_per_level[lv])
            t_chip = int(tiles_per_chip_level[lv])
            fill = np.zeros(ndev, dtype=np.int64)
            for j in range(t_real):
                d = int(tile_chip[t_base + j])
                slot_t = dst_tile + int(fill[d])
                fill[d] += 1
                s0, s1 = (t_base + j) * tr, (t_base + j + 1) * tr
                o0, o1 = slot_t * tr, (slot_t + 1) * tr
                slot_row[d, o0:o1] = sched.slot_row[s0:s1]
                col[d, o0:o1] = sched.col[s0:s1]
                val[d, o0:o1] = sched.val[s0:s1]
                inv_diag[d, o0:o1] = sched.inv_diag[s0:s1]
            t_base += t_real
            dst_tile += t_chip
        assert dst_tile == total_tiles_chip

        # batch boundaries in per-chip tile units
        lvl_tile_start = np.concatenate(
            [[0], np.cumsum(tiles_per_chip_level)]
        ).astype(np.int64)
        batch_t0 = np.array([lvl_tile_start[b0] for b0, b1 in batches])
        batch_nt = np.array([lvl_tile_start[b1] - lvl_tile_start[b0]
                             for b0, b1 in batches])

        # segments: contiguous batch runs whose chunk (nt*tr) varies <= 2x
        segs = []  # (first_batch, nbatches, chunk_tiles)
        i = 0
        while i < len(batches):
            j = i
            mx = int(batch_nt[i])
            while j + 1 < len(batches):
                cand = max(mx, int(batch_nt[j + 1]))
                if cand > 2 * max(min(mx, int(batch_nt[j + 1])), 1) and \
                   len(segs) < 7:
                    break
                mx = cand
                j += 1
            segs.append((i, j - i + 1, mx))
            i = j + 1
        # merge tail into last segment if too many
        self._segments = segs

        sh = lambda spec: NamedSharding(self.mesh, spec)
        self._slot_row = jax.device_put(slot_row[:, :, None],
                                        sh(P(chips_axis)))
        self._col = jax.device_put(col, sh(P(chips_axis)))
        self._val = jax.device_put(val, sh(P(chips_axis)))
        self._inv_diag = jax.device_put(inv_diag[:, :, None],
                                        sh(P(chips_axis)))
        # Full slot->row map, replicated, for the exchange scatter.
        # Padded by the largest segment chunk: the exchange dynamic-slices
        # (ndev, chunk) at t0*tr, and a segment's LAST batch can have
        # t0*tr + chunk > S — XLA clamps out-of-bounds starts, which would
        # silently shift the slice onto the previous batch's rows and
        # scatter the gathered values to the wrong places (observed: 0.24
        # rel-err on lower_triangular(600, 5, seed=1) with 8 chips).
        max_chunk = max(ct for (_, _, ct) in segs) * tr
        sr_pad = np.full((ndev, S + max_chunk), n, dtype=INDEX_DTYPE)
        sr_pad[:, :S] = slot_row
        self._slot_row_all = jnp.asarray(sr_pad)
        self._batch_t0 = jnp.asarray(batch_t0.astype(np.int32))
        self._batch_nt = jnp.asarray(batch_nt.astype(np.int32))
        self.bytes_per_iter = col.size * (4 + l.data.itemsize)
        # collective traffic: per batch, ndev * chunk values
        self.collective_bytes = int(sum(
            nb * ct * tr * ndev * l.data.itemsize
            for (_, nb, ct) in segs
        ))
        self._build(n)

    def _build(self, n):
        tr = self._tr
        ndev = self.ndev
        segments = self._segments
        batch_t0 = self._batch_t0
        batch_nt = self._batch_nt

        def body(slot_row, col, val, inv_diag, sr_all, b_pad):
            sr, c, v, idg, bp = (slot_row[0, :, 0], col[0], val[0],
                                 inv_diag[0, :, 0], b_pad[0])

            def run_segment(x, first, nbatches, chunk_tiles):
                C = chunk_tiles * tr

                def batch_body(i, x):
                    t0 = batch_t0[first + i]
                    ntiles = batch_nt[first + i]

                    def tile_body(t, carry):
                        x, vbuf = carry
                        s0 = (t0 + t) * tr
                        rows = lax.dynamic_slice_in_dim(sr, s0, tr)
                        ct = lax.dynamic_slice_in_dim(c, s0, tr)
                        vt = lax.dynamic_slice_in_dim(v, s0, tr)
                        dt = lax.dynamic_slice_in_dim(idg, s0, tr)
                        acc = jnp.sum(vt * x[ct], axis=1)
                        xb = (bp[rows] - acc) * dt
                        safe = jnp.where(rows == n, n + 1, rows)
                        # local update: intra-batch deps are chip-local and
                        # resolve through x immediately
                        x = x.at[safe].set(xb)
                        vbuf = lax.dynamic_update_slice(vbuf, xb, (t * tr,))
                        return x, vbuf

                    x, vbuf = lax.fori_loop(
                        0, ntiles, tile_body,
                        (x, jnp.zeros(C, dtype=v.dtype)),
                    )
                    # exchange ONLY the batch's solved slots
                    gathered = lax.all_gather(vbuf, chips_axis)  # (ndev, C)
                    rows_all = lax.dynamic_slice(
                        sr_all, (jnp.zeros((), t0.dtype), t0 * tr), (ndev, C)
                    )
                    # mask slots beyond this batch (segment padding) and pads
                    in_batch = (jax.lax.broadcasted_iota(
                        jnp.int32, (ndev, C), 1) < ntiles * tr)
                    safe_all = jnp.where(
                        in_batch & (rows_all != n), rows_all, n + 1
                    )
                    x = x.at[safe_all.reshape(-1)].set(gathered.reshape(-1))
                    return x

                return lax.fori_loop(0, nbatches, batch_body, x)

            x = jnp.zeros(n + 2, dtype=v.dtype)
            for (first, nbatches, chunk_tiles) in segments:
                x = run_segment(x, first, nbatches, chunk_tiles)
            return x[None, :n]

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(chips_axis), P(chips_axis), P(chips_axis),
                      P(chips_axis), P(None, None), P(None)),
            out_specs=P(None),
            check_vma=False,
        )

        @jax.jit
        def run(slot_row, col, val, inv_diag, sr_all, b_pad):
            return fn(slot_row, col, val, inv_diag, sr_all, b_pad)[0]

        self._fn = fn   # raw shard_map body (multi-RHS wrapper maps over it)
        self._run = run

    def __call__(self, b):
        n = self.shape[0]
        b = jnp.asarray(b, dtype=self.dtype)
        if b.shape != (n,):
            raise ValueError(f"b must have shape ({n},)")
        b_pad = jnp.concatenate([b, jnp.zeros(2, dtype=b.dtype)])[None]
        return self._run(self._slot_row, self._col, self._val,
                         self._inv_diag, self._slot_row_all, b_pad)


def dist_sptrsv(l: CSR, b, mesh: Mesh | None = None, **kw):
    return DistSptrsvPlan(l, mesh, **kw)(b)
