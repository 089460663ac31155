"""Multi-chip SpTRSV (SURVEY.md C10 — the arXiv:2012.06959 capability).

Level-set wavefront across chips: each level's tiles are dealt round-robin to
chips; every chip solves its tiles against the current replicated x, then the
newly solved entries are combined with a `psum` over ICI (the TPU-native
replacement for the reference's unified-memory cross-GPU propagation). The
whole level loop runs inside one jitted shard_map, so a level costs one loop
iteration plus one collective, not a host dispatch.

Known bottleneck (SURVEY.md hard part #5): one psum per level is
latency-bound for deep factors; level batching (fusing consecutive levels
whose cross-chip dependencies allow it) is the planned optimization.
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

        # Re-pad every level to a multiple of ndev tiles, then deal tiles of
        # each level round-robin so chip d's slots stack contiguously.
        lot = sched.level_of_tile
        tiles_per_level = np.bincount(lot, minlength=sched.nlevels)
        tpl_pad = _round_up(np.maximum(tiles_per_level, 1), ndev)
        tiles_per_chip_level = tpl_pad // ndev  # (L,)
        total_tiles_chip = int(tiles_per_chip_level.sum())

        # chip-local slot arrays: (ndev, total_tiles_chip * tr)
        S = total_tiles_chip * tr
        slot_row = np.full((ndev, S), n, dtype=INDEX_DTYPE)
        col = np.full((ndev, S, sched.width), n, dtype=INDEX_DTYPE)
        val = np.zeros((ndev, S, sched.width), dtype=l.data.dtype)
        inv_diag = np.ones((ndev, S), dtype=l.data.dtype)

        src_tile = 0
        dst_tile = 0
        for lv in range(sched.nlevels):
            t_real = int(tiles_per_level[lv])
            t_chip = int(tiles_per_chip_level[lv])
            for j in range(t_chip * ndev):
                d, slot_t = j % ndev, dst_tile + j // ndev
                if j < t_real:
                    s0, s1 = (src_tile + j) * tr, (src_tile + j + 1) * tr
                    o0, o1 = slot_t * tr, (slot_t + 1) * tr
                    slot_row[d, o0:o1] = sched.slot_row[s0:s1]
                    col[d, o0:o1] = sched.col[s0:s1]
                    val[d, o0:o1] = sched.val[s0:s1]
                    inv_diag[d, o0:o1] = sched.inv_diag[s0:s1]
            src_tile += t_real
            dst_tile += t_chip
        assert dst_tile == total_tiles_chip

        level_start = np.concatenate(
            [[0], np.cumsum(tiles_per_chip_level)]
        ).astype(np.int32)

        sh = lambda spec: NamedSharding(self.mesh, spec)
        self._slot_row = jax.device_put(slot_row[:, :, None], sh(P(chips_axis)))
        self._col = jax.device_put(col, sh(P(chips_axis)))
        self._val = jax.device_put(val, sh(P(chips_axis)))
        self._inv_diag = jax.device_put(inv_diag[:, :, None], sh(P(chips_axis)))
        self._level_start = jnp.asarray(level_start)
        self._tr = tr
        self._build(n, sched.nlevels, tr)
        self.bytes_per_iter = col.size * (4 + l.data.itemsize)

    def _build(self, n, nlevels, tr):
        level_start = self._level_start

        def body(slot_row, col, val, inv_diag, b_pad):
            sr, c, v, idg, bp = (slot_row[0, :, 0], col[0], val[0],
                                 inv_diag[0, :, 0], b_pad[0])

            def level_body(lv, x):
                t0 = level_start[lv]
                ntiles = level_start[lv + 1] - t0

                def tile_body(t, delta):
                    s0 = (t0 + t) * tr
                    rows = lax.dynamic_slice_in_dim(sr, s0, tr)
                    ct = lax.dynamic_slice_in_dim(c, s0, tr)
                    vt = lax.dynamic_slice_in_dim(v, s0, tr)
                    dt = lax.dynamic_slice_in_dim(idg, s0, tr)
                    acc = jnp.sum(vt * x[ct], axis=1)
                    xb = (bp[rows] - acc) * dt
                    safe = jnp.where(rows == n, n + 1, rows)
                    return delta.at[safe].set(xb)

                delta = lax.fori_loop(
                    0, ntiles, tile_body, jnp.zeros(n + 2, dtype=v.dtype)
                )
                delta = lax.psum(delta, chips_axis)
                return x + delta

            x = lax.fori_loop(
                0, nlevels, level_body, jnp.zeros(n + 2, dtype=v.dtype)
            )
            return x[None, :n]

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(chips_axis), P(chips_axis), P(chips_axis),
                      P(chips_axis), P(None)),
            out_specs=P(None),
            check_vma=False,
        )

        @jax.jit
        def run(slot_row, col, val, inv_diag, b_pad):
            return fn(slot_row, col, val, inv_diag, b_pad)[0]

        self._run = run

    def __call__(self, b):
        n = self.shape[0]
        b = jnp.asarray(b, dtype=self.dtype)
        if b.shape != (n,):
            raise ValueError(f"b must have shape ({n},)")
        b_pad = jnp.concatenate([b, jnp.zeros(2, dtype=b.dtype)])[None]
        return self._run(self._slot_row, self._col, self._val,
                         self._inv_diag, b_pad)


def dist_sptrsv(l: CSR, b, mesh: Mesh | None = None, **kw):
    return DistSptrsvPlan(l, mesh, **kw)(b)
