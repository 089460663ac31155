"""e33: per-(block,window) round CAPPING with straggler diversion in the
hybrid-PSEG tail.

e32 closed the *rebalancing* lever: tail fill on powerlaw-1M is Poisson
cell imbalance, and column/row interleaving makes it worse; even a perfect
balancer only reaches tail fill 0.58 because cells are (panel,row)-bound.
But e32 never priced *diversion*: a (blk,win) group's round count is the
MAX cell occupancy, so a spike cell (a tail row with many entries in one
panel window) forces whole 1024-slot rounds that exist only to carry it.
Capping the group at c rounds and diverting the overflow entries to the
existing straggler COO side path trades diverted entries for saved rounds.

Cost model (streamed-bytes bound): a removed round saves 8 KB of schedule
stream ~= 11.4 ns at STREAM; a straggler costs rho * 11.4 ns on the XLA
scatter side path (e14 measured ~2.9-15 ns each at 70K stragglers, i.e.
rho in [0.25, 1.3] — the chip micro-measurement decides). Closed-form
optimum per group: stepping the cap from c to c-1 saves one round and
diverts count(c) = #{cells with size >= c} extra entries, profitable iff
rho * count(c) < 1; count is nondecreasing as c falls, so the stop point
is cap* = the (maxcells+1)-th largest cell size, maxcells = floor(1/rho).
rho >= 1 therefore never caps — the whole lever rides on the side path
being several times cheaper per entry than a streamed round slot.

Host-side only — no chip. Run: python experiments/e33_tail_cap_divert.py
[--uk-full]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sblas import datasets  # noqa: E402
from sblas.plan_cache import cached_matrix  # noqa: E402
from sblas.retile_pseg import (BLOCK_ROWS, HUB_PANELS, LANES, SUBLANES,
                               TAIL_WIN)  # noqa: E402
from sblas.ops.kernels.spmv_pseg import hub_relabel  # noqa: E402


def tail_cells(a):
    """(cell_sizes, cell_group) of the hybrid tail's (blk, win, sublane,
    lane) cells — mirrors _pack_pseg_hybrid_impl's keying exactly."""
    rows = a.row_ids().astype(np.int64)
    cols = a.indices.astype(np.int64)
    hub = cols < HUB_PANELS * LANES
    tr, tc = rows[~hub], cols[~hub]
    tblk = tr // BLOCK_ROWS
    ttl = (tr % BLOCK_ROWS) % LANES
    pan_t = tc // LANES
    win = pan_t // TAIL_WIN
    off = pan_t % TAIL_WIN
    s = off % SUBLANES
    nwin = int(win.max()) + 1
    key = ((tblk * nwin + win) * LANES + ttl) * SUBLANES + s
    key.sort()
    first = np.concatenate([[True], key[1:] != key[:-1]])
    cell_sizes = np.diff(np.concatenate([np.flatnonzero(first), [len(key)]]))
    cell_group = key[first] // (LANES * SUBLANES)  # blk*nwin + win
    return cell_sizes, cell_group, int(hub.sum()), len(tc)


def simulate(cell_sizes, cell_group, rho):
    """Optimal per-group cap for cost = rounds + rho * diverted.

    cap* = (maxcells+1)-th largest cell size in the group (see header);
    groups with <= maxcells cells cap at 1 (a single round always remains —
    diverting a whole group buys nothing once its last round is shared).
    Returns (base_rounds, saved_rounds, diverted)."""
    maxcells = int(np.floor(1.0 / rho - 1e-12))
    # sort cells by (group, size desc)
    order = np.lexsort((-cell_sizes, cell_group))
    cs = cell_sizes[order].astype(np.int64)
    cg = cell_group[order]
    first = np.concatenate([[True], cg[1:] != cg[:-1]])
    starts = np.flatnonzero(first)
    glen = np.diff(np.concatenate([starts, [len(cs)]]))
    base_rounds = cs[starts]  # first = largest per group
    total_base = int(base_rounds.sum())
    if maxcells < 1:
        return total_base, 0, 0
    # cap per group: size of the (maxcells+1)-th largest cell, or 1
    capped_idx = starts + maxcells
    has = glen > maxcells
    cap = np.ones(len(starts), np.int64)
    cap[has] = cs[capped_idx[has]]
    cap = np.minimum(cap, base_rounds)
    # diverted = sum over cells of max(size - cap_of_group, 0)
    gid = np.cumsum(first) - 1
    div = np.maximum(cs - cap[gid], 0)
    return total_base, int((base_rounds - cap).sum()), int(div.sum())


def main():
    if "--uk-full" in sys.argv:
        cases = [("uk-2002-full", lambda: datasets.emulate(
            "uk-2002", scale=1.0, dtype=np.float32))]
    else:
        cases = [("powerlaw-1M-102M", lambda: datasets.powerlaw_graph(
            1_000_000, avg_deg=120, seed=7, dtype=np.float32))]
    out = Path(__file__).parent / "e33_results.jsonl"
    for name, gen in cases:
        t0 = time.time()
        a = cached_matrix(f"suite-large-{name}", gen)
        a2, _cp, _rp = hub_relabel(a)
        if a2 is None:
            a2 = a
        print(f"# {name}: loaded+relabeled in {time.time()-t0:.1f}s",
              flush=True)
        cell_sizes, cell_group, hub_nnz, tail_nnz = tail_cells(a2)
        for rho in (0.1, 0.25, 0.5, 0.9):
            base, saved, div = simulate(cell_sizes, cell_group, rho)
            rec = {
                "exp": "e33", "case": name, "rho": rho,
                "tail_nnz": tail_nnz, "hub_nnz": hub_nnz,
                "base_tail_rounds": base, "saved_rounds": saved,
                "diverted": div,
                "base_tail_fill": round(tail_nnz / (base * 1024), 4),
                "capped_tail_fill": round(
                    (tail_nnz - div) / max((base - saved) * 1024, 1), 4),
                "divert_frac": round(div / max(tail_nnz, 1), 5),
                "rounds_saved_frac": round(saved / max(base, 1), 4),
                # projected wall delta at 11.4 ns/round, rho*11.4 ns/strag
                "proj_ms_saved": round((saved - rho * div) * 11.4e-6, 3),
            }
            print(json.dumps(rec), flush=True)
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
