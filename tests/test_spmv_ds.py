"""Double-single (two-f32-plane) f64-class Pallas SpMV (spmv_wsell_ds).

The error model promises ~max_deg * 2^-48 relative accuracy — 7 orders
tighter than f32 — without ever materializing an f64 array on device
(SURVEY.md C5 fp64 row; the TPU-native answer to the reference's native-f64
CUDA kernels). Tests run the kernel in interpret mode on CPU.
"""
import numpy as np
import pytest

from sblas import datasets
from sblas.golden import spmv_golden, rel_err
from sblas.ops.spmv import SpmvPlan


def _norm_err(y, ref):
    return float(np.max(np.abs(y - ref)) / np.max(np.abs(ref)))


def test_ds_f64_class_accuracy():
    a = datasets.emulate("cant", scale=0.05, dtype=np.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1])
    plan = SpmvPlan(a, "pallas_ds")
    y = plan(x)
    ref = spmv_golden(a, x)
    assert y.dtype == np.float64
    assert _norm_err(y, ref) < 1e-13


def test_ds_beats_f32_by_orders():
    # same matrix/vector through the f32 kernel: ds must be >= 1e5x tighter
    a64 = datasets.emulate("cant", scale=0.05, dtype=np.float64)
    a32 = datasets.emulate("cant", scale=0.05, dtype=np.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a64.shape[1])
    ref = spmv_golden(a64, x)
    e_ds = _norm_err(SpmvPlan(a64, "pallas_ds")(x), ref)
    y32 = np.asarray(SpmvPlan(a32, "pallas")(x.astype(np.float32)),
                     dtype=np.float64)
    e_32 = _norm_err(y32, ref)
    assert e_ds < 1e-5 * e_32, (e_ds, e_32)


def test_ds_wide_dynamic_range_values():
    # 12 decades of value magnitude: plain f32 loses the small entries
    # entirely; the lo plane must carry them
    a = datasets.emulate("cant", scale=0.03, dtype=np.float64)
    rng = np.random.default_rng(2)
    data = a.data * np.exp(rng.uniform(-14, 14, a.nnz))
    a = type(a)(a.shape, a.indptr, a.indices, data)
    x = rng.standard_normal(a.shape[1])
    y = SpmvPlan(a, "pallas_ds")(x)
    assert _norm_err(y, spmv_golden(a, x)) < 1e-12


def test_ds_alpha_beta():
    a = datasets.emulate("cant", scale=0.03, dtype=np.float64)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(a.shape[1])
    y0 = rng.standard_normal(a.shape[0])
    out = SpmvPlan(a, "pallas_ds")(x, alpha=2.5, beta=-0.5, y=y0)
    ref = spmv_golden(a, x, alpha=2.5, beta=-0.5, y=y0)
    assert rel_err(out, ref) < 1e-12


def test_ds_blocked_y_mode(monkeypatch):
    # force the one-pallas_call-per-y-block layout on a small matrix
    from sblas.ops.kernels import spmv_wsell_ds as ds_mod

    monkeypatch.setattr(ds_mod, "_VMEM_Y_LIMIT", 64 * 1024)
    monkeypatch.setattr(ds_mod, "_YBLOCKS", 8)
    a = datasets.emulate("cant", scale=0.05, dtype=np.float64)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(a.shape[1])
    plan = SpmvPlan(a, "pallas_ds")
    assert plan._pallas.blocked and plan._pallas.layout.num_yblks > 1
    assert _norm_err(plan(x), spmv_golden(a, x)) < 1e-13


def test_ds_rejects_f32_and_scattered():
    a32 = datasets.emulate("cant", scale=0.03, dtype=np.float32)
    with pytest.raises(ValueError, match="f64 path"):
        SpmvPlan(a32, "pallas_ds")
    scat = datasets.random_csr(700, 650, 9, seed=3, dtype=np.float64)
    with pytest.raises(ValueError, match="fill"):
        SpmvPlan(scat, "pallas_ds")


def test_ds_apply_pure_guard():
    a = datasets.emulate("cant", scale=0.03, dtype=np.float64)
    plan = SpmvPlan(a, "pallas_ds")
    with pytest.raises(ValueError, match="two f32 planes"):
        plan.apply_pure(plan.device_arrays(), np.zeros(a.shape[1],
                                                       np.float32))
