"""Jitted device-resident CG / PCG."""

import numpy as np
import pytest

from sblas import datasets, solvers
from sblas.formats import CSR
from sblas.ops import SpmvPlan


def _badly_scaled_spd(n=1600, seed=0):
    """SPD with a wide-range diagonal: D^1/2 A D^1/2 — Jacobi's regime."""
    a = datasets.poisson2d(int(np.sqrt(n)), dtype=np.float64)
    rng = np.random.default_rng(seed)
    d = np.exp(rng.uniform(-3, 3, a.shape[0]))
    s = a.to_scipy().astype(np.float64)
    import scipy.sparse as sp

    dm = sp.diags(np.sqrt(d))
    out = (dm @ s @ dm).tocsr()
    out.sort_indices()
    return CSR.from_scipy(out).astype(np.float32)


def test_cg_converges():
    a = datasets.poisson2d(32, dtype=np.float32)
    b = np.random.default_rng(1).standard_normal(a.shape[0]).astype(
        np.float32)
    x, info = solvers.cg(a, b, tol=1e-5)
    assert info["rel_residual"] < 1e-5
    err = np.linalg.norm(a.to_scipy() @ np.asarray(x) - b) / np.linalg.norm(b)
    assert err < 5e-5


def test_jacobi_pcg_beats_cg_on_bad_scaling():
    a = _badly_scaled_spd()
    b = np.random.default_rng(2).standard_normal(a.shape[0]).astype(
        np.float32)
    _, plain = solvers.cg(a, b, tol=1e-4, maxiter=3000)
    _, pre = solvers.cg(a, b, tol=1e-4, maxiter=3000,
                        M=solvers.jacobi(a))
    assert pre["rel_residual"] < 1e-4
    assert pre["iterations"] < plain["iterations"]


def test_cg_accepts_plan_and_x0():
    a = datasets.poisson2d(24, dtype=np.float32)
    plan = SpmvPlan(a, "ell")
    b = np.random.default_rng(3).standard_normal(a.shape[0]).astype(
        np.float32)
    x1, info1 = solvers.cg(plan, b, tol=1e-5)
    # warm start from the solution: should converge immediately
    _, info2 = solvers.cg(plan, b, tol=1e-5, x0=np.asarray(x1))
    assert info2["iterations"] <= 1


def test_cg_rejects_rectangular():
    a = datasets.random_csr(10, 20, 3, seed=4, dtype=np.float32)
    with pytest.raises(ValueError):
        solvers.cg(a, np.zeros(10, np.float32))


def test_bicgstab_nonsymmetric():
    # diagonally dominant nonsymmetric system
    a = datasets.random_csr(800, 800, 6, bandwidth=40, seed=5,
                            dtype=np.float64)
    s = a.to_scipy().tolil()
    import scipy.sparse as sp

    s.setdiag(np.abs(s).sum(axis=1).A1 + 1.0)
    m = CSR.from_scipy(s.tocsr()).astype(np.float32)
    b = np.random.default_rng(6).standard_normal(800).astype(np.float32)
    x, info = solvers.bicgstab(m, b, tol=1e-5, maxiter=500)
    assert info["rel_residual"] < 1e-5
    err = (np.linalg.norm(m.to_scipy() @ np.asarray(x) - b)
           / np.linalg.norm(b))
    assert err < 5e-5


def test_bicgstab_with_jacobi():
    a = _badly_scaled_spd(n=900, seed=7)
    b = np.random.default_rng(8).standard_normal(a.shape[0]).astype(
        np.float32)
    _, pre = solvers.bicgstab(a, b, tol=1e-4, maxiter=3000,
                              M=solvers.jacobi(a))
    assert pre["rel_residual"] < 1e-4
