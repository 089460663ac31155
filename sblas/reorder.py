"""Bandwidth-reducing reordering (reverse Cuthill–McKee).

The w-SELL layout charges each row block one 2-panel (256-column) window
per round, so fill — and therefore the achieved fraction of STREAM — is
set by column locality (DESIGN.md "Layout"). FEM matrices from meshers
usually arrive with good locality; matrices with scrambled numbering do
not, and land on the slower PSEG/bucket paths. RCM restores locality for
anything whose underlying graph is mesh-like.

Usage:

    ap, perm = sblas.reorder.rcm(a)      # ap = P A P^T, symmetric perm
    plan = SpmvPlan(ap, "pallas")
    y = unpermute(plan(x[perm]), perm)   # or stay in permuted space

``rcm_profile(a)`` reports the fill the w-SELL packer would get before
and after, so callers can decide whether the two permutation applications
per drop-in call are worth it (iterative solvers amortize them to zero by
staying in permuted space, as examples/cg.py does with plans generally).
"""

from __future__ import annotations

import numpy as np

from .formats import CSR


def rcm(a: CSR) -> tuple[CSR, np.ndarray]:
    """Symmetric reverse Cuthill–McKee reordering of a square CSR matrix.

    Returns (P A P^T, perm) with ``perm[new] = old`` — i.e. apply as
    ``x_perm = x[perm]`` and ``y = y_perm_inverse`` (see ``unpermute``).
    The ordering is computed on the symmetrized pattern |A| + |A|^T.
    """
    m, n = a.shape
    if m != n:
        raise ValueError("rcm needs a square matrix")
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    s = a.to_scipy().tocsr()
    pattern = (abs(s) + abs(s).T).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(pattern, symmetric_mode=True),
                      dtype=np.int64)
    sp = s[perm][:, perm].tocsr()
    sp.sort_indices()
    return CSR.from_scipy(sp).astype(a.dtype), perm


def unpermute(y_perm, perm: np.ndarray):
    """Undo the row permutation of ``rcm`` on a result vector/matrix."""
    out = np.empty_like(np.asarray(y_perm))
    out[perm] = np.asarray(y_perm)
    return out


def rcm_profile(a: CSR, **pack_kw) -> dict:
    """w-SELL fill before/after RCM (cheap slot-count probe, no packing)."""
    from .retile_wsell import pick_sub, LANES
    from .retile_wsell import _chunk_stats

    def fill_of(mat):
        sub = pick_sub(mat)
        lps = LANES // sub
        _, slots = _chunk_stats(mat, lps)
        return mat.nnz / max(slots, 1)

    ap, _ = rcm(a)
    return {"fill_before": fill_of(a), "fill_after": fill_of(ap)}
