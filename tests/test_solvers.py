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


def test_ichol_pcg_beats_plain_cg():
    a = datasets.poisson2d(48, dtype=np.float32)
    b = np.random.default_rng(10).standard_normal(a.shape[0]).astype(
        np.float32)
    _, plain = solvers.cg(a, b, tol=1e-5, maxiter=2000)
    _, ic = solvers.cg(a, b, tol=1e-5, maxiter=2000, M=solvers.ichol(a))
    assert ic["rel_residual"] < 1e-5
    assert ic["iterations"] < plain["iterations"] / 2


def test_ic0_native_matches_numpy():
    from sblas import formats, native

    a = datasets.spd_diag_dominant(400, 6, seed=11, dtype=np.float64)
    lo = formats.tril(a)
    v1 = lo.data.astype(np.float64).copy()
    v2 = lo.data.astype(np.float64).copy()
    rc1 = native.ic0_inplace(lo.indptr, lo.indices, v1)
    rc2 = solvers._ic0_numpy(lo.indptr, lo.indices, v2)
    assert rc1 == rc2 == 0 or rc1 == -1  # -1 = no toolchain
    if rc1 == 0:
        np.testing.assert_allclose(v1, v2, rtol=1e-13)


def test_ichol_factor_quality():
    """L L^T must reproduce A on A's own pattern (IC(0) contract)."""
    from sblas import formats

    a = datasets.spd_diag_dominant(300, 5, seed=12, dtype=np.float64)
    arrs, apply = solvers.ichol(a)
    # solve M z = r exactly equals scipy with the explicit factor
    import scipy.sparse as sp

    r = np.random.default_rng(13).standard_normal(300)
    z = np.asarray(apply(arrs, np.asarray(r)))
    # z should satisfy: applying M to z gives back r
    lo = formats.tril(a)
    vals = lo.data.astype(np.float64).copy()
    assert solvers._ic0_numpy(lo.indptr, lo.indices, vals) == 0
    L = sp.csr_matrix((vals, lo.indices, lo.indptr), shape=lo.shape)
    back = L @ (L.T @ z)
    np.testing.assert_allclose(back, r, rtol=1e-4, atol=1e-6)


def test_ichol_requires_diagonal():
    import pytest as _pytest

    from sblas.formats import CSR

    # matrix with a missing diagonal entry
    a = CSR((3, 3), np.array([0, 1, 2, 3]), np.array([0, 0, 2]),
            np.array([2.0, 1.0, 2.0], dtype=np.float32))
    with _pytest.raises(ValueError, match="diagonal"):
        solvers.ichol(a)


def test_gmres_nonsymmetric():
    import scipy.sparse as sp

    n = 900
    rng = np.random.default_rng(21)
    a = datasets.random_csr(n, n, 9, bandwidth=40, seed=21,
                            dtype=np.float64)
    s = a.to_scipy().tolil()
    s.setdiag(np.abs(s).sum(axis=1).A1 + 1.0)
    a = CSR.from_scipy(s.tocsr()).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    x, info = solvers.gmres(a, b, tol=1e-6, maxiter=600, restart=30)
    assert info["rel_residual"] < 1e-6
    err = (np.linalg.norm(a.to_scipy() @ np.asarray(x) - b)
           / np.linalg.norm(b))
    assert err < 1e-5


def test_gmres_restart_cycles_and_precond():
    # small restart forces multiple cycles; jacobi right-preconditioning
    # must cut the iteration count on a badly scaled system
    a = _badly_scaled_spd(n=1024, seed=4)
    b = np.random.default_rng(4).standard_normal(a.shape[0]).astype(
        np.float32)
    x, plain = solvers.gmres(a, b, tol=1e-4, maxiter=4000, restart=20)
    err = (np.linalg.norm(a.to_scipy() @ np.asarray(x) - b)
           / np.linalg.norm(b))
    assert plain["rel_residual"] < 1e-4
    assert err < 5e-3  # restarted GMRES: true residual near the estimate
    _, pre = solvers.gmres(a, b, tol=1e-4, maxiter=4000, restart=20,
                           M=solvers.jacobi(a))
    assert pre["rel_residual"] < 1e-4
    assert pre["iterations"] < plain["iterations"]


def test_gmres_matches_cg_on_spd():
    a = datasets.poisson2d(24, dtype=np.float32)
    b = np.random.default_rng(6).standard_normal(a.shape[0]).astype(
        np.float32)
    xg, _ = solvers.gmres(a, b, tol=1e-6, maxiter=2000, restart=40)
    xc, _ = solvers.cg(a, b, tol=1e-6, maxiter=2000)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xc), rtol=0,
                               atol=5e-4)


def _nonsym_convection(nx=32, eps=0.02):
    """Convection-diffusion 2D upwind stencil — classically ILU's regime."""
    import scipy.sparse as sp

    n = nx * nx
    h = 1.0 / (nx + 1)
    # -eps*lap + b . grad with upwinding; strongly nonsymmetric
    main = np.full(n, 4 * eps / h**2 + 2 / h)
    west = np.full(n - 1, -eps / h**2 - 1 / h)
    east = np.full(n - 1, -eps / h**2)
    south = np.full(n - nx, -eps / h**2 - 1 / h)
    north = np.full(n - nx, -eps / h**2)
    west[np.arange(1, n) % nx == 0] = 0.0
    east[np.arange(1, n) % nx == 0] = 0.0
    s = sp.diags([main, west, east, south, north],
                 [0, -1, 1, -nx, nx]).tocsr()
    s.sort_indices()
    return CSR.from_scipy(s).astype(np.float32)


def test_ilu0_exact_on_tridiagonal():
    # tridiagonal LU has no fill, so ILU(0) = exact LU: one preconditioner
    # application solves the system (GMRES converges in O(1) iterations).
    a = datasets.banded(500, 1, seed=11, dtype=np.float64)
    s = a.to_scipy().tolil()
    s.setdiag(np.abs(s).sum(axis=1).A1 + 1.0)
    m = CSR.from_scipy(s.tocsr()).astype(np.float32)
    b = np.random.default_rng(12).standard_normal(500).astype(np.float32)
    # iterations count whole fixed-m Arnoldi cycles (restart per cycle);
    # an exact preconditioner needs exactly ONE short cycle.
    x, info = solvers.gmres(m, b, tol=1e-5, maxiter=50, restart=4,
                            M=solvers.ilu(m))
    assert info["rel_residual"] < 1e-5
    assert info["iterations"] <= 4


def test_ilu0_gmres_beats_plain_on_convection():
    m = _nonsym_convection()
    b = np.random.default_rng(13).standard_normal(m.shape[0]).astype(
        np.float32)
    _, plain = solvers.gmres(m, b, tol=1e-6, maxiter=800, restart=30)
    _, pre = solvers.gmres(m, b, tol=1e-6, maxiter=800, restart=30,
                           M=solvers.ilu(m))
    assert pre["rel_residual"] < 1e-6
    assert pre["iterations"] < plain["iterations"] / 2


def test_ilu0_bicgstab_nonsymmetric():
    m = _nonsym_convection(nx=24, eps=0.05)
    b = np.random.default_rng(14).standard_normal(m.shape[0]).astype(
        np.float32)
    _, pre = solvers.bicgstab(m, b, tol=1e-5, maxiter=400,
                              M=solvers.ilu(m))
    assert pre["rel_residual"] < 1e-5


def test_ilu0_native_matches_numpy():
    from sblas import native

    m = _nonsym_convection(nx=12)
    vals_np = m.data.astype(np.float64).copy()
    rc = solvers._ilu0_numpy(m.indptr, m.indices, vals_np)
    assert rc == 0
    if native.have_native():
        vals_c = m.data.astype(np.float64).copy()
        rc_c = native.ilu0_inplace(m.indptr, m.indices, vals_c)
        assert rc_c == 0
        np.testing.assert_allclose(vals_c, vals_np, rtol=1e-13)


def test_ilu0_factor_quality():
    # || A - L U ||_F restricted error should be small relative to ||A||
    # on a diagonally dominant matrix (ILU(0) residual lives OFF-pattern).
    import scipy.sparse as sp

    m = _nonsym_convection(nx=16)
    vals = m.data.astype(np.float64).copy()
    assert solvers._ilu0_numpy(m.indptr, m.indices, vals) == 0
    fac = sp.csr_matrix((vals, m.indices, m.indptr), shape=m.shape)
    l = sp.tril(fac, -1) + sp.eye(m.shape[0])
    u = sp.triu(fac)
    a64 = m.to_scipy().astype(np.float64)
    res = (l @ u - a64)
    # on-pattern residual ~ 0 (exact by construction)
    on = res.multiply(abs(a64).sign())
    assert sp.linalg.norm(on) / sp.linalg.norm(a64) < 1e-10


def test_ilu0_shift_rescue_and_errors():
    import scipy.sparse as sp

    # A = [[1,1],[1,1]]: u11 = 1 - l10*u01 = 0 — zero pivot at row 1;
    # the doubling diagonal shift must rescue it.
    m = CSR.from_scipy(sp.csr_matrix(np.ones((2, 2)))).astype(np.float64)
    arrs, apply = solvers.ilu(m)
    z = np.asarray(apply(arrs, np.ones(2)))
    assert np.isfinite(z).all()
    # missing diagonal rejected
    nd = CSR.from_scipy(sp.csr_matrix(np.array([[1.0, 1.0], [1.0, 0.0]])))
    with pytest.raises(ValueError, match="diagonal"):
        solvers.ilu(nd)
    with pytest.raises(ValueError, match="square"):
        solvers.ilu(datasets.random_csr(8, 6, 2, seed=0))
