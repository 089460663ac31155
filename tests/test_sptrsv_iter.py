"""Jacobi-sweep (truncated-Neumann) triangular solves — ops/sptrsv_iter.py.

Exactness at nlevels-1 sweeps follows from nilpotency of D^{-1}E; the
truncated path is validated as a preconditioner inside PCG/GMRES.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import sblas
from sblas import solvers
from sblas.formats import CSR, csr_transpose, tril, triu
from sblas.ops.sptrsv_iter import SptrsvJacobiPlan, SptrsmJacobiPlan


def _rand_lower(n, density, seed, *, dtype=np.float32, unit=False):
    rng = np.random.default_rng(seed)
    a = sp.random(n, n, density=density, random_state=rng,
                  format="csr", dtype=np.float64)
    d = np.ones(n) if unit else (2.0 + rng.random(n))
    a = (sp.tril(a, k=-1) + sp.diags(d)).tocsr()
    a.sort_indices()
    return CSR((n, n), a.indptr.astype(np.int32),
               a.indices.astype(np.int32), a.data.astype(dtype))


@pytest.mark.parametrize("unit", [False, True])
@pytest.mark.parametrize("n,density", [(64, 0.1), (300, 0.03)])
def test_exact_at_nlevels(n, density, unit, rng_seed=7):
    l = _rand_lower(n, density, rng_seed, unit=unit)
    b = np.random.default_rng(rng_seed + 1).standard_normal(n).astype(
        np.float32)
    plan = SptrsvJacobiPlan(l, lower=True, unit_diagonal=unit)
    assert plan.sweeps == plan.nlevels - 1
    x = np.asarray(plan(b))
    ref = sp.linalg.spsolve_triangular(
        l.to_scipy().tocsr().astype(np.float64), b.astype(np.float64),
        lower=True, unit_diagonal=unit)
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)


def test_upper_exact():
    l = _rand_lower(200, 0.05, 3)
    u = csr_transpose(l)
    b = np.random.default_rng(4).standard_normal(200).astype(np.float32)
    plan = SptrsvJacobiPlan(u, lower=False)
    x = np.asarray(plan(b))
    ref = sp.linalg.spsolve_triangular(
        u.to_scipy().tocsr().astype(np.float64), b.astype(np.float64),
        lower=False)
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)


def test_diagonal_matrix_zero_sweeps():
    n = 50
    d = 1.0 + np.arange(n, dtype=np.float32)
    l = CSR((n, n), np.arange(n + 1, dtype=np.int32),
            np.arange(n, dtype=np.int32), d)
    plan = SptrsvJacobiPlan(l)
    assert plan.sweeps == 0 and plan.method == "jacobi+diag"
    b = np.ones(n, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(plan(b)), 1.0 / d, rtol=1e-6)


def test_truncation_error_decays():
    # diagonally dominant factor: each extra sweep shrinks the error
    l = _rand_lower(400, 0.02, 11)
    b = np.random.default_rng(12).standard_normal(400).astype(np.float32)
    ref = sp.linalg.spsolve_triangular(
        l.to_scipy().tocsr().astype(np.float64), b.astype(np.float64),
        lower=True)
    plan = SptrsvJacobiPlan(l)
    arrs = plan.device_arrays()
    errs = [np.linalg.norm(np.asarray(
                plan.apply_pure(arrs, b, sweeps=k)) - ref)
            for k in (0, 2, 4, 8)]
    assert errs[1] < errs[0] and errs[2] < errs[1] and errs[3] < errs[2]


def test_entry_point_method_jacobi():
    l = _rand_lower(128, 0.06, 21)
    b = np.random.default_rng(22).standard_normal(128).astype(np.float32)
    x = np.asarray(sblas.sptrsv(l, b, method="jacobi"))
    ref = np.asarray(sblas.sptrsv(l, b, method="tiles"))
    np.testing.assert_allclose(x, ref, rtol=3e-4, atol=3e-4)
    # trans solve routes through the same transpose handling
    xt = np.asarray(sblas.sptrsv(l, b, trans=True, method="jacobi"))
    rt = np.asarray(sblas.sptrsv(l, b, trans=True, method="tiles"))
    np.testing.assert_allclose(xt, rt, rtol=3e-4, atol=3e-4)


def test_sptrsm_jacobi_multi_rhs():
    l = _rand_lower(150, 0.05, 31)
    bmat = np.random.default_rng(32).standard_normal((150, 8)).astype(
        np.float32)
    plan = SptrsmJacobiPlan(l, lower=True)
    x = np.asarray(plan(bmat))
    ref = sp.linalg.spsolve_triangular(
        l.to_scipy().tocsr().astype(np.float64),
        bmat.astype(np.float64), lower=True)
    np.testing.assert_allclose(x, ref, rtol=3e-4, atol=3e-4)
    xe = np.asarray(sblas.sptrsm(l, bmat, method="jacobi"))
    np.testing.assert_allclose(xe, ref, rtol=3e-4, atol=3e-4)


def test_bad_inputs():
    n = 16
    # zero diagonal rejected
    l = CSR((n, n), np.arange(n + 1, dtype=np.int32),
            np.arange(n, dtype=np.int32),
            np.zeros(n, dtype=np.float32))
    with pytest.raises(ValueError, match="diagonal"):
        SptrsvJacobiPlan(l)
    good = _rand_lower(n, 0.2, 5)
    plan = SptrsvJacobiPlan(good)
    with pytest.raises(ValueError, match="shape"):
        plan(np.ones(n + 1, dtype=np.float32))


def _poisson2d(nx):
    from sblas import datasets

    return datasets.poisson2d(nx)


def test_pcg_with_sweep_ichol():
    a = _poisson2d(24)
    n = a.shape[0]
    b = np.random.default_rng(41).standard_normal(n).astype(a.dtype)
    x_exact, info_exact = solvers.cg(a, b, M=solvers.ichol(a), tol=1e-5,
                                     maxiter=600)
    x_sw, info_sw = solvers.cg(a, b, M=solvers.ichol(a, trsv_sweeps=4),
                               tol=1e-5, maxiter=600)
    assert info_exact["rel_residual"] < 1e-5
    assert info_sw["rel_residual"] < 1e-5
    # truncated preconditioner costs extra iterations but stays close
    assert info_sw["iterations"] <= 3 * info_exact["iterations"] + 10


def test_gmres_with_sweep_ilu():
    # nonsymmetric: poisson2d + skewed off-diagonal perturbation
    a = _poisson2d(18).to_scipy().tolil()
    n = a.shape[0]
    rng = np.random.default_rng(51)
    rows = rng.integers(0, n - 1, 60)
    for i in rows:
        a[i, i + 1] = a[i, i + 1] + 0.3
    a = CSR.from_scipy(a.tocsr()).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    x, info = solvers.gmres(a, b, M=solvers.ilu(a, trsv_sweeps=4),
                            tol=1e-5, maxiter=400)
    assert info["rel_residual"] < 1e-5
