"""RCM reordering: fill recovery and algebraic correctness."""

import numpy as np
import pytest

from sblas import datasets
from sblas.formats import CSR
from sblas.golden import rel_err, spmv_golden
from sblas.ops import SpmvPlan
from sblas.reorder import rcm, rcm_profile, unpermute


def _scrambled_banded(n=4000, bw=60, nnz_per_row=40, seed=0):
    """A banded matrix with its numbering destroyed — the regime RCM fixes."""
    a = datasets.random_csr(n, n, nnz_per_row, bandwidth=bw, seed=seed,
                            dtype=np.float32)
    rng = np.random.default_rng(seed + 1)
    p = rng.permutation(n)
    s = a.to_scipy().tocsr()[p][:, p].tocsr()
    s.sort_indices()
    return CSR.from_scipy(s).astype(np.float32)


def test_rcm_restores_fill():
    a = _scrambled_banded()
    prof = rcm_profile(a)
    assert prof["fill_after"] > 3 * prof["fill_before"], prof


def test_rcm_spmv_correct():
    a = _scrambled_banded(n=2000)
    ap, perm = rcm(a)
    x = np.random.default_rng(2).standard_normal(2000).astype(np.float32)
    plan = SpmvPlan(ap, "ell")
    y = unpermute(np.asarray(plan(x[perm])), perm)
    assert rel_err(y, spmv_golden(a, x)) < 1e-5


def test_rcm_pallas_path_packs():
    from sblas.retile_wsell import pack_wsell

    a = _scrambled_banded(n=8000)
    ap, perm = rcm(a)
    before, after = pack_wsell(a, th=256).fill, pack_wsell(ap, th=256).fill
    assert after > 0.4 and after > 3 * before, (before, after)
    plan = SpmvPlan(ap, "pallas")  # must not raise the low-fill ValueError
    x = np.random.default_rng(3).standard_normal(8000).astype(np.float32)
    y = unpermute(np.asarray(plan(x[perm])), perm)
    assert rel_err(y, spmv_golden(a, x)) < 1e-4


def test_rcm_rejects_rectangular():
    a = datasets.random_csr(10, 20, 3, seed=4, dtype=np.float32)
    with pytest.raises(ValueError):
        rcm(a)


def test_spmv_auto_chain_rescues_scrambled_band():
    """auto on a scrambled band: w-SELL refuses (fill), PSEG refuses (no
    hubs), the rcm rescue packs it — instead of the old XLA fallthrough."""
    import jax

    from sblas.ops.spmv import SpmvPlan as SP
    from sblas import ops

    a = _scrambled_banded(n=8000)
    plan = SP(a, "rcm")
    assert plan.method == "rcm"
    assert plan.fill > 0.3
    x = np.random.default_rng(5).standard_normal(8000).astype(np.float32)
    # drop-in __call__
    y = np.asarray(plan(x))
    assert rel_err(y, spmv_golden(a, x)) < 1e-4
    # jit-composable apply_pure
    arrs = plan.device_arrays()
    y2 = np.asarray(jax.jit(plan.apply_pure)(arrs, x))
    assert rel_err(y2, spmv_golden(a, x)) < 1e-4
    # permuted-space fast path round-trips
    perm = np.asarray(plan._rcm_perm)
    yp = np.asarray(jax.jit(plan.apply_permuted)(arrs, x[perm]))
    assert rel_err(yp[np.asarray(plan._rcm_inv)], spmv_golden(a, x)) < 1e-4


def test_spmv_alpha_beta_rcm():
    a = _scrambled_banded(n=4000, seed=8)
    rng = np.random.default_rng(9)
    x = rng.standard_normal(4000).astype(np.float32)
    y0 = rng.standard_normal(4000).astype(np.float32)
    from sblas.ops.spmv import SpmvPlan as SP

    out = np.asarray(SP(a, "rcm")(x, alpha=1.5, beta=0.25, y=y0))
    assert rel_err(out, spmv_golden(a, x, alpha=1.5, beta=0.25, y=y0)) < 1e-4
