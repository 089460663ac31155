import numpy as np
import pytest

from sblas import datasets
from sblas.golden import sptrsv_golden, rel_err
from sblas.ops.sptrsv import SptrsvPlan
from sblas.sptrsv_schedule import build_level_schedule, validate_schedule
from sblas.formats import tril, csr_transpose
from sblas import native


def test_level_schedule_simple():
    # bidiagonal: level[i] = i (fully serial)
    l = datasets.banded(10, 1, seed=0, dtype=np.float64)
    l = tril(l)
    sched = build_level_schedule(l)
    np.testing.assert_array_equal(sched.levels, np.arange(10))
    assert sched.nlevels == 10
    validate_schedule(sched)


def test_level_schedule_diagonal():
    # diagonal matrix: all rows level 0
    from sblas.formats import COO, coo_to_csr

    n = 16
    l = coo_to_csr(COO((n, n), np.arange(n), np.arange(n), np.ones(n)))
    sched = build_level_schedule(l)
    assert sched.nlevels == 1
    validate_schedule(sched)


def test_native_matches_numpy_levels():
    l = tril(datasets.random_csr(300, 300, 6, seed=1, dtype=np.float64))
    lv_np, nl_np = native._level_schedule_numpy(l.indptr, l.indices, 300, lower=True)
    if native.have_native():
        lv_c, nl_c = native.level_schedule(l.indptr, l.indices, 300, lower=True)
        np.testing.assert_array_equal(lv_c, lv_np)
        assert nl_c == nl_np


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("gen", ["band", "random", "chol"])
def test_sptrsv_vs_golden(dtype, gen):
    if gen == "band":
        l = datasets.lower_triangular(200, 4, bandwidth=8, seed=2, dtype=dtype)
    elif gen == "random":
        l = datasets.lower_triangular(300, 6, seed=3, dtype=dtype)
    else:
        a = datasets.spd_diag_dominant(150, 5, bandwidth=12, seed=4, dtype=np.float64)
        l = datasets.cholesky_factor(a, dtype=dtype)
    b = np.random.default_rng(5).standard_normal(l.shape[0]).astype(dtype)
    x = np.asarray(SptrsvPlan(l)(b))
    ref = sptrsv_golden(l, b)
    tol = 1e-10 if dtype == np.float64 else 2e-4
    assert rel_err(x, ref) < tol


def test_sptrsv_unit_diagonal():
    l = datasets.lower_triangular(100, 5, seed=6, dtype=np.float64,
                                  unit_diagonal=True)
    b = np.random.default_rng(7).standard_normal(100)
    x = np.asarray(SptrsvPlan(l, unit_diagonal=True)(b))
    ref = sptrsv_golden(l, b, unit_diagonal=True)
    assert rel_err(x, ref) < 1e-10


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_sptrsv_upper(dtype):
    lo = datasets.lower_triangular(150, 5, seed=8, dtype=dtype)
    u = csr_transpose(lo)
    b = np.random.default_rng(9).standard_normal(150).astype(dtype)
    x = np.asarray(SptrsvPlan(u, lower=False)(b))
    ref = sptrsv_golden(u, b, lower=False)
    tol = 1e-10 if dtype == np.float64 else 2e-4
    assert rel_err(x, ref) < tol


@pytest.mark.parametrize("lower", [True, False])
def test_sptrsv_pallas_interpret(lower):
    # Exercise the Pallas wavefront path explicitly (interpret mode on CPU)
    # for BOTH sweeps — the upper-triangular ordering bug (ADVICE r1, high)
    # was invisible to the auto path, which picks 'tiles' on CPU.
    lo = datasets.lower_triangular(300, 5, seed=8, dtype=np.float32)
    l = lo if lower else csr_transpose(lo)
    b = np.random.default_rng(9).standard_normal(300).astype(np.float32)
    plan = SptrsvPlan(l, lower=lower, method="pallas")
    assert plan.method == "pallas", "pallas path must be reachable here"
    x = np.asarray(plan(b))
    ref = sptrsv_golden(l, b, lower=lower)
    assert rel_err(x, ref) < 2e-4


def test_sptrsv_missing_diag_raises():
    from sblas.formats import COO, coo_to_csr

    l = coo_to_csr(COO((3, 3), [1, 2], [0, 1], [1.0, 1.0]))
    with pytest.raises(ValueError):
        SptrsvPlan(l)


def test_sptrsv_tile_sizes():
    l = datasets.lower_triangular(256, 6, seed=10, dtype=np.float64)
    b = np.random.default_rng(11).standard_normal(256)
    ref = sptrsv_golden(l, b)
    for tr in (8, 32, 128):
        x = np.asarray(SptrsvPlan(l, tile_rows=tr, validate=True)(b))
        assert rel_err(x, ref) < 1e-10


def test_native_golden_matches_scipy():
    if not native.have_native():
        pytest.skip("no native lib")
    l = datasets.lower_triangular(200, 5, seed=12, dtype=np.float64)
    b = np.random.default_rng(13).standard_normal(200)
    x = native.sptrsv_golden_native(l.indptr, l.indices, l.data, b)
    ref = sptrsv_golden(l, b)
    assert rel_err(x, ref) < 1e-12


def test_sptrsv_dense_tail_hybrid():
    # Deep-narrow level tails (Cholesky factors of meshes) must switch to
    # dense 128-row block backsubstitution instead of padding each tiny
    # level to a 128-row block (SURVEY.md §7 hard part 2; VERDICT r1 item 5).
    from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv, build_layout

    a = datasets.poisson2d(40, dtype=np.float64)
    l = datasets.cholesky_factor(a, dtype=np.float32)
    lay = build_layout(l, cache=False)
    assert lay.n_dense > 0
    pad_ratio = lay.num_blocks * 128 / l.shape[0]
    assert pad_ratio < 2.0, pad_ratio  # was ~128 without the hybrid

    p = PallasSptrsv(l)
    b = np.random.default_rng(1).standard_normal(l.shape[0]).astype(np.float32)
    x = np.asarray(p.apply_traced(b))
    assert rel_err(x, sptrsv_golden(l, b)) < 2e-4

    u = csr_transpose(l)
    pu = PallasSptrsv(u, lower=False)
    xu = np.asarray(pu.apply_traced(b))
    assert rel_err(xu, sptrsv_golden(u, b, lower=False)) < 2e-4


def test_sptrsv_dense_tail_unit_diagonal():
    from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv

    l = datasets.banded(600, 1, seed=5, dtype=np.float32)  # bidiagonal chain
    from sblas.formats import tril
    l = tril(l)
    b = np.random.default_rng(6).standard_normal(600).astype(np.float32)
    p = PallasSptrsv(l)
    assert p.n_dense_blocks > 0  # fully serial -> all tail
    x = np.asarray(p.apply_traced(b))
    assert rel_err(x, sptrsv_golden(l, b)) < 2e-4


def test_sptrsv_nd_cholesky_factor():
    # nested-dissection ordered mesh factor: the realistic BASELINE config
    # #3 workload — wide early levels + narrow tail (hybrid head+dense).
    from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv, build_layout

    a = datasets.poisson2d_nd(40, dtype=np.float64)
    l = datasets.cholesky_factor(a, dtype=np.float32)
    lay = build_layout(l, cache=False)
    assert lay.num_blocks * 128 / l.shape[0] < 2.0
    p = PallasSptrsv(l)
    b = np.random.default_rng(2).standard_normal(l.shape[0]).astype(np.float32)
    x = np.asarray(p.apply_traced(b))
    assert rel_err(x, sptrsv_golden(l, b)) < 2e-4


@pytest.mark.parametrize("dot_mode,tol",
                         [("highest", 2e-4), ("split3", 2e-4),
                          ("split2", 2e-3), ("default", 2e-1)])
def test_sptrsv_dot_modes(dot_mode, tol):
    # e25 (experiments/e25_results.jsonl): the segment dot is ~4-6% of the
    # round, split3 matches HIGHEST accuracy (5.6e-8 vs 5.5e-8 end-to-end
    # on the band factor) and is the default; split2/default trade
    # accuracy. This guards correctness of every mode's kernel lowering.
    from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv

    a = datasets.poisson2d_nd(24, dtype=np.float64)
    l = datasets.cholesky_factor(a, dtype=np.float32)
    p = PallasSptrsv(l, dot_mode=dot_mode)
    b = np.random.default_rng(3).standard_normal(l.shape[0]).astype(np.float32)
    x = np.asarray(p.apply_traced(b))
    assert rel_err(x, sptrsv_golden(l, b)) < tol
