"""Multi-chip paths on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from sblas import datasets
from sblas.golden import spmv_golden, spmm_golden, sptrsv_golden, rel_err
from sblas.parallel import (
    make_mesh, DistSpmvPlan, DistSpmmPlan, DistSptrsvPlan,
)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


@pytest.mark.parametrize("strategy", ["even_rows", "nnz_balanced", "nnz_split"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_dist_spmv(mesh8, strategy, dtype):
    a = datasets.random_csr(500, 500, 8, skew=0.7, seed=1, dtype=dtype)
    x = np.random.default_rng(2).standard_normal(500).astype(dtype)
    plan = DistSpmvPlan(a, mesh8, strategy=strategy)
    y = np.asarray(plan(x))
    tol = 1e-10 if dtype == np.float64 else 5e-5
    assert rel_err(y, spmv_golden(a, x)) < tol


def test_dist_spmv_rectangular(mesh8):
    a = datasets.random_csr(300, 500, 5, seed=3, dtype=np.float64)
    x = np.random.default_rng(4).standard_normal(500)
    y = np.asarray(DistSpmvPlan(a, mesh8)(x))
    assert rel_err(y, spmv_golden(a, x)) < 1e-10


def test_dist_spmv_alpha_beta(mesh8):
    a = datasets.random_csr(200, 200, 6, seed=5, dtype=np.float64)
    rng = np.random.default_rng(6)
    x, y0 = rng.standard_normal(200), rng.standard_normal(200)
    out = np.asarray(DistSpmvPlan(a, mesh8)(x, alpha=2.0, beta=-1.0, y=y0))
    assert rel_err(out, spmv_golden(a, x, 2.0, -1.0, y0)) < 1e-10


@pytest.mark.parametrize("k", [8, 32])
def test_dist_spmm(mesh8, k):
    a = datasets.random_csr(400, 350, 7, seed=7, dtype=np.float64)
    x = np.random.default_rng(8).standard_normal((350, k))
    y = np.asarray(DistSpmmPlan(a, mesh8)(x))
    assert rel_err(y, spmm_golden(a, x)) < 1e-10


@pytest.mark.parametrize("gen", ["band", "random"])
def test_dist_sptrsv(mesh8, gen):
    if gen == "band":
        l = datasets.lower_triangular(300, 4, bandwidth=9, seed=9, dtype=np.float64)
    else:
        l = datasets.lower_triangular(300, 5, seed=10, dtype=np.float64)
    b = np.random.default_rng(11).standard_normal(300)
    x = np.asarray(DistSptrsvPlan(l, mesh8)(b))
    assert rel_err(x, sptrsv_golden(l, b)) < 1e-10


def test_dist_matches_single_chip(mesh8):
    from sblas.ops.spmv import SpmvPlan

    a = datasets.random_csr(256, 256, 8, seed=12, dtype=np.float64)
    x = np.random.default_rng(13).standard_normal(256)
    y_single = np.asarray(SpmvPlan(a, "ell")(x))
    y_multi = np.asarray(DistSpmvPlan(a, mesh8)(x))
    assert rel_err(y_multi, y_single) < 1e-12


def test_ring_spmv(mesh8):
    from sblas.parallel import RingSpmvPlan

    a = datasets.random_csr(400, 400, 8, seed=20, dtype=np.float64)
    x = np.random.default_rng(21).standard_normal(400)
    y = np.asarray(RingSpmvPlan(a, mesh8)(x))
    assert rel_err(y, spmv_golden(a, x)) < 1e-10


def test_ring_matches_allgather(mesh8):
    from sblas.parallel import RingSpmvPlan, DistSpmvPlan

    a = datasets.random_csr(256, 256, 6, bandwidth=40, seed=22,
                            dtype=np.float32)
    x = np.random.default_rng(23).standard_normal(256).astype(np.float32)
    y_ring = np.asarray(RingSpmvPlan(a, mesh8)(x))
    y_ag = np.asarray(DistSpmvPlan(a, mesh8)(x))
    assert rel_err(y_ring, y_ag) < 1e-5
