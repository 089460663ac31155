"""f64-class ds paths for SpTRSV (refinement) and SpMM (k ds passes).

SpTRSV pallas_ds = f32 VMEM wavefront + slot-space double-single residual
refinement (kernels/sptrsv_ds.py; VERDICT r2 item 4 — the wavefront is
issue-bound per e24, so refinement beats a two-plane kernel port). SpMM
pallas_ds = k double-single SpMV passes over one shared two-plane w-SELL
layout. Both take numpy float64 at the boundary; kernels run in interpret
mode on CPU here.
"""
import numpy as np
import pytest

from sblas import datasets
from sblas.golden import (spmm_golden, sptrsv_golden, rel_err)
from sblas.ops.spmm import SpmmPlan
from sblas.ops.sptrsv import SptrsvPlan


def test_sptrsv_ds_band_accuracy():
    l = datasets.lower_triangular(600, 6, bandwidth=60, seed=1,
                                  dtype=np.float64)
    b = np.random.default_rng(0).standard_normal(600)
    p = SptrsvPlan(l, method="pallas_ds")
    x = p(b)
    assert x.dtype == np.float64
    err = rel_err(x, sptrsv_golden(l, b))
    assert err < 1e-12, err
    # 6+ orders tighter than the f32 wavefront on the same system
    xf = np.asarray(SptrsvPlan(l.astype(np.float32), method="pallas")(
        b.astype(np.float32)))
    assert err < 1e-5 * max(rel_err(xf, sptrsv_golden(l, b)), 1e-30)


def test_sptrsv_ds_chol_factor():
    spd = datasets.poisson2d_nd(14, dtype=np.float64)
    l = datasets.cholesky_factor(spd, dtype=np.float64)
    b = np.random.default_rng(1).standard_normal(l.shape[0])
    x = SptrsvPlan(l, method="pallas_ds")(b)
    assert rel_err(x, sptrsv_golden(l, b)) < 1e-12


def test_sptrsv_ds_unit_diagonal():
    l = datasets.lower_triangular(400, 5, bandwidth=40, seed=2,
                                  dtype=np.float64, unit_diagonal=True)
    b = np.random.default_rng(2).standard_normal(400)
    x = SptrsvPlan(l, method="pallas_ds", unit_diagonal=True)(b)
    assert rel_err(x, sptrsv_golden(l, b, unit_diagonal=True)) < 1e-12


def test_sptrsv_ds_rejects_f32():
    l = datasets.lower_triangular(300, 5, seed=3, dtype=np.float32)
    with pytest.raises(ValueError, match="f64"):
        SptrsvPlan(l, method="pallas_ds")


def test_spmm_ds_accuracy_and_axpby():
    a = datasets.random_csr(800, 800, 14, bandwidth=80, seed=4,
                            dtype=np.float64)
    x = np.random.default_rng(3).standard_normal((800, 8))
    p = SpmmPlan(a, "pallas_ds", k_hint=8)
    y = p(x)
    g = spmm_golden(a, x)
    assert y.dtype == np.float64
    assert rel_err(y, g) < 1e-13
    out = p(x, alpha=2.0, beta=-0.5, y=g)
    assert rel_err(out, 1.5 * g) < 1e-12


def test_spmm_ds_apply_pure_raises():
    a = datasets.random_csr(640, 640, 14, bandwidth=64, seed=5,
                            dtype=np.float64)
    p = SpmmPlan(a, "pallas_ds", k_hint=4)
    with pytest.raises(ValueError, match="planes"):
        p.apply_pure(p.device_arrays(), np.zeros((640, 4), np.float32))


def test_sptrsm_ds_band_accuracy():
    from sblas.golden import sptrsm_golden
    from sblas.ops.sptrsm import sptrsm

    l = datasets.lower_triangular(600, 6, bandwidth=60, seed=6,
                                  dtype=np.float64)
    b = np.random.default_rng(4).standard_normal((600, 8))
    x = sptrsm(l, b, method="pallas_ds")
    assert x.dtype == np.float64
    assert rel_err(x, sptrsm_golden(l, b)) < 1e-12


def test_sptrsm_ds_chol_factor_partial_chunk():
    # k=5 pads the 8-wide lanes chunk; padded columns must stay zero
    from sblas.golden import sptrsm_golden
    from sblas.ops.kernels.sptrsv_ds import PallasSptrsmDS

    spd = datasets.poisson2d_nd(14, dtype=np.float64)
    l = datasets.cholesky_factor(spd, dtype=np.float64)
    b = np.random.default_rng(5).standard_normal((l.shape[0], 5))
    x = PallasSptrsmDS(l)(b)
    assert x.shape == (l.shape[0], 5)
    assert rel_err(x, sptrsm_golden(l, b)) < 1e-12


def test_sptrsm_ds_multi_chunk_and_unit_diag():
    # k=12 -> two lanes chunks; unit diagonal materialized in Ls
    from sblas.golden import sptrsm_golden
    from sblas.ops.sptrsm import sptrsm

    l = datasets.lower_triangular(400, 5, bandwidth=40, seed=7,
                                  dtype=np.float64, unit_diagonal=True)
    b = np.random.default_rng(6).standard_normal((400, 12))
    x = sptrsm(l, b, method="pallas_ds", unit_diagonal=True)
    assert rel_err(x, sptrsm_golden(l, b, unit_diagonal=True)) < 1e-12


def test_sptrsm_ds_rejects_f32():
    from sblas.ops.kernels.sptrsv_ds import PallasSptrsmDS

    l = datasets.lower_triangular(300, 5, seed=8, dtype=np.float32)
    with pytest.raises(ValueError, match="f64"):
        PallasSptrsmDS(l)
