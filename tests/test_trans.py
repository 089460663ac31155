"""Transpose (`trans=`) and CSC-input coverage for the op entry points.

The reference operates over CSR and CSC (SURVEY.md §0); `sblas.ops.common`
reduces {CSR, CSC} x {trans, no-trans} to a cached CSR of the applied
operator. These tests pin the algebra of all four corners for each routine.
"""

import numpy as np
import pytest

import sblas
from sblas import datasets
from sblas.formats import coo_to_csc, csr_transpose
from sblas.golden import rel_err, spmv_golden, sptrsv_golden
from sblas.ops import SpmvPlan, spmv, spmm, sptrsv
from sblas.ops.common import as_csr


def _csc_of(a):
    return coo_to_csc(a.tocoo())


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_spmv_trans(dtype):
    a = datasets.random_csr(120, 90, 7, seed=3, dtype=dtype)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[0]).astype(dtype)  # A^T is (n, m)
    y = np.asarray(spmv(a, x, trans=True))
    assert y.shape == (a.shape[1],)
    assert rel_err(y, spmv_golden(csr_transpose(a), x)) < 1e-5


def test_spmv_csc_input():
    a = datasets.random_csr(80, 100, 5, seed=4)
    c = _csc_of(a)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    y = np.asarray(spmv(c, x))
    assert rel_err(y, spmv_golden(a, x)) < 1e-5


def test_spmv_csc_trans_is_zero_copy():
    a = datasets.random_csr(60, 70, 4, seed=5)
    c = _csc_of(a)
    t = as_csr(c, trans=True)
    # CSC of A is byte-identical to CSR of A^T: no copy, same buffers.
    assert t.indptr is c.indptr and t.indices is c.indices
    rng = np.random.default_rng(2)
    x = rng.standard_normal(a.shape[0]).astype(np.float32)
    y = np.asarray(spmv(c, x, trans=True))
    assert rel_err(y, spmv_golden(csr_transpose(a), x)) < 1e-5


def test_as_csr_caches_derived():
    a = datasets.random_csr(50, 50, 3, seed=6)
    assert as_csr(a) is a
    assert as_csr(a, trans=True) is as_csr(a, trans=True)
    c = _csc_of(a)
    assert as_csr(c) is as_csr(c)


def test_spmv_trans_alpha_beta():
    a = datasets.random_csr(70, 64, 6, seed=7)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(a.shape[0]).astype(np.float32)
    y0 = rng.standard_normal(a.shape[1]).astype(np.float32)
    out = np.asarray(spmv(a, x, alpha=2.5, beta=-0.5, y=y0, trans=True))
    gold = spmv_golden(csr_transpose(a), x, alpha=2.5, beta=-0.5, y=y0)
    assert rel_err(out, gold) < 1e-5


@pytest.mark.parametrize("k", [1, 8])
def test_spmm_trans_and_csc(k):
    a = datasets.random_csr(90, 110, 5, seed=8)
    rng = np.random.default_rng(4)
    xt = rng.standard_normal((a.shape[0], k)).astype(np.float32)
    got = np.asarray(spmm(a, xt, trans=True))
    assert rel_err(got, spmv_golden(csr_transpose(a), xt)) < 1e-5
    x = rng.standard_normal((a.shape[1], k)).astype(np.float32)
    got_csc = np.asarray(spmm(_csc_of(a), x))
    assert rel_err(got_csc, spmv_golden(a, x)) < 1e-5


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_sptrsv_trans_backsolve(dtype):
    """The classic Cholesky backsolve: L^T x = b given lower-stored L."""
    l = datasets.lower_triangular(150, 5, seed=9, dtype=dtype)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(150).astype(dtype)
    x = np.asarray(sptrsv(l, b, lower=True, trans=True))
    gold = sptrsv_golden(csr_transpose(l), b, lower=False)
    assert rel_err(x, gold) < (1e-10 if dtype == np.float64 else 1e-4)


def test_sptrsv_csc_input():
    l = datasets.lower_triangular(120, 4, seed=10, dtype=np.float32)
    rng = np.random.default_rng(6)
    b = rng.standard_normal(120).astype(np.float32)
    x = np.asarray(sptrsv(_csc_of(l), b, lower=True))
    assert rel_err(x, sptrsv_golden(l, b, lower=True)) < 1e-4


def test_plan_accepts_csc():
    a = datasets.random_csr(64, 64, 4, seed=11)
    plan = SpmvPlan(_csc_of(a), "ell")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(64).astype(np.float32)
    assert rel_err(np.asarray(plan(x)), spmv_golden(a, x)) < 1e-5


def test_as_csr_rejects_foreign_types():
    with pytest.raises(TypeError):
        as_csr(np.eye(3))


def test_top_level_api_exposes_trans():
    a = datasets.random_csr(40, 40, 3, seed=12)
    rng = np.random.default_rng(8)
    x = rng.standard_normal(40).astype(np.float32)
    y = np.asarray(sblas.spmv(a, x, trans=True))
    assert rel_err(y, spmv_golden(csr_transpose(a), x)) < 1e-5
