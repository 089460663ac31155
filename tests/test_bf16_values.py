"""Opt-in bf16 value stream on the Pallas paths (interpret mode on CPU).

Values are stored bf16 (halving the dominant HBM stream); gathers and
accumulation stay f32, so the error is bounded by one rounding of each
matrix value (~1e-2 worst-case relative after summation)."""

import numpy as np
import pytest

from sblas import datasets
from sblas.golden import rel_err, spmv_golden
from sblas.ops import SpmvPlan, SpmmPlan


BF16_TOL = 2e-2


def test_spmv_pallas_bf16():
    a = datasets.emulate("cant", scale=0.05, dtype=np.float32)
    x = np.random.default_rng(0).standard_normal(a.shape[1]).astype(
        np.float32)
    p32 = SpmvPlan(a, "pallas")
    pbf = SpmvPlan(a, "pallas", value_dtype="bfloat16")
    assert pbf.bytes_per_iter < p32.bytes_per_iter
    assert rel_err(np.asarray(pbf(x)), spmv_golden(a, x)) < BF16_TOL
    # and clearly coarser than the f32 path
    assert rel_err(np.asarray(p32(x)), spmv_golden(a, x)) < 1e-5


def test_spmv_pseg_bf16():
    g = datasets.emulate("uk-2002", scale=0.003, dtype=np.float32)
    x = np.random.default_rng(1).standard_normal(g.shape[1]).astype(
        np.float32)
    p = SpmvPlan(g, "pseg", value_dtype="bfloat16")
    assert p.method == "pseg"
    assert rel_err(np.asarray(p(x)), spmv_golden(g, x)) < BF16_TOL


def test_spmm_pallas_bf16():
    a = datasets.emulate("cant", scale=0.04, dtype=np.float32)
    x = np.random.default_rng(2).standard_normal((a.shape[1], 8)).astype(
        np.float32)
    p = SpmmPlan(a, "pallas", value_dtype="bfloat16")
    assert rel_err(np.asarray(p(x)), spmv_golden(a, x)) < BF16_TOL


def test_value_dtype_rejected_elsewhere():
    a = datasets.random_csr(64, 64, 4, seed=3, dtype=np.float32)
    with pytest.raises(ValueError):
        SpmvPlan(a, "pallas", value_dtype=np.int8)
