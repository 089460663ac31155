import numpy as np
import pytest

from sblas import datasets
from sblas.golden import spmv_golden, rel_err, default_tol
from sblas.ops.spmv import SpmvPlan, spmv


MATRICES = {
    "banded": lambda dt: datasets.banded(300, 5, seed=1, dtype=dt),
    "random": lambda dt: datasets.random_csr(257, 301, 9, seed=2, dtype=dt),
    "skewed": lambda dt: datasets.random_csr(400, 400, 12, skew=1.2, seed=3, dtype=dt),
    "empty_rows": lambda dt: datasets.random_csr(100, 90, 2, seed=4, dtype=dt),
    "poisson": lambda dt: datasets.poisson2d(17, dtype=dt),
}


@pytest.mark.parametrize("method", ["coo", "ell", "bucket"])
@pytest.mark.parametrize("name", list(MATRICES))
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_spmv_methods_vs_golden(method, name, dtype):
    a = MATRICES[name](dtype)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(a.shape[1]).astype(dtype)
    plan = SpmvPlan(a, method)
    y = np.asarray(plan(x))
    ref = spmv_golden(a, x)
    assert rel_err(y, ref) < default_tol(dtype), f"{method}/{name}"


@pytest.mark.parametrize("method", ["coo", "ell", "bucket"])
def test_spmv_alpha_beta(method):
    a = datasets.random_csr(64, 64, 6, seed=5, dtype=np.float64)
    rng = np.random.default_rng(8)
    x = rng.standard_normal(64)
    y0 = rng.standard_normal(64)
    plan = SpmvPlan(a, method)
    out = np.asarray(plan(x, alpha=2.5, beta=-0.5, y=y0))
    ref = spmv_golden(a, x, alpha=2.5, beta=-0.5, y=y0)
    assert rel_err(out, ref) < 1e-11


def test_spmv_beta_requires_y():
    a = datasets.random_csr(8, 8, 2, seed=0)
    with pytest.raises(ValueError):
        SpmvPlan(a, "coo")(np.ones(8, np.float32), beta=1.0)


def test_spmv_shape_check():
    a = datasets.random_csr(8, 10, 2, seed=0)
    with pytest.raises(ValueError):
        SpmvPlan(a, "coo")(np.ones(9, np.float32))


def test_spmv_heavy_row_split():
    # one row with 600 nnz, max_width forces splitting across bucket slots
    rng = np.random.default_rng(11)
    rows = np.concatenate([np.zeros(600, np.int64),
                           rng.integers(1, 200, 400)])
    cols = rng.integers(0, 200, 1000)
    vals = rng.standard_normal(1000)
    from sblas.formats import COO, coo_to_csr
    a = coo_to_csr(COO((200, 200), rows, cols, vals))
    x = rng.standard_normal(200)
    plan = SpmvPlan(a, "bucket", max_width=128)
    y = np.asarray(plan(x))
    assert rel_err(y, spmv_golden(a, x)) < 1e-11


def test_spmv_toplevel_cache():
    import sblas

    a = datasets.random_csr(32, 32, 4, seed=6)
    x = np.ones(32, np.float32)
    y1 = sblas.spmv(a, x, method="coo")
    y2 = sblas.spmv(a, x, method="coo")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


def test_spmv_rectangular_wide_and_tall():
    for (m, n) in [(50, 300), (300, 50)]:
        a = datasets.random_csr(m, n, 4, seed=9, dtype=np.float64)
        x = np.random.default_rng(1).standard_normal(n)
        for method in ("coo", "ell", "bucket"):
            y = np.asarray(SpmvPlan(a, method)(x))
            assert rel_err(y, spmv_golden(a, x)) < 1e-11


def test_spmv_bsr_method():
    a = datasets.random_csr(300, 280, 10, bandwidth=50, seed=21, dtype=np.float32)
    x = np.random.default_rng(22).standard_normal(280).astype(np.float32)
    y = np.asarray(SpmvPlan(a, "bsr")(x))
    assert rel_err(y, spmv_golden(a, x)) < 2e-5


def test_spmv_bsr_f64():
    a = datasets.poisson2d(20, dtype=np.float64)
    x = np.random.default_rng(23).standard_normal(a.shape[1])
    y = np.asarray(SpmvPlan(a, "bsr")(x))
    assert rel_err(y, spmv_golden(a, x)) < 1e-11


def test_spmv_pseg_scattered_path():
    # PSEG (hub-relabeled packed-segment) path: the scattered/power-law fast
    # path (VERDICT r1 item 6). Must validate via the drop-in API and pack
    # at materially higher fill than w-SELL on graph inputs.
    import jax

    g = datasets.emulate("uk-2002", scale=0.003, dtype=np.float32)
    plan = SpmvPlan(g, "pseg")
    x = np.random.default_rng(50).standard_normal(g.shape[1]).astype(np.float32)
    y = np.asarray(jax.jit(plan.apply_pure)(plan.device_arrays(), x))
    assert rel_err(y, spmv_golden(g, x)) < 1e-5
    assert plan.fill > 0.5
    # alpha/beta epilogue through the public entry point
    y0 = np.random.default_rng(51).standard_normal(g.shape[0]).astype(np.float32)
    y2 = np.asarray(spmv(g, x, alpha=2.0, beta=0.5, y=y0, method="pseg"))
    assert rel_err(y2, 2.0 * spmv_golden(g, x) + 0.5 * y0) < 1e-5


def test_spmv_auto_chain_to_pseg():
    # auto on a simulated accelerator must fall w-SELL -> PSEG on power-law
    import sblas.utils.backend as be

    g = datasets.emulate("uk-2002", scale=0.003, dtype=np.float32)
    saved = be._BACKEND
    be._BACKEND = "tpu"
    try:
        plan = SpmvPlan(g, "auto")
        assert plan.method == "pseg", plan.method
    finally:
        be._BACKEND = saved


def test_pseg_layout_roundtrip():
    from sblas.retile_pseg import pack_pseg, pseg_to_dense

    a = datasets.random_csr(1500, 1500, 5, seed=7, dtype=np.float32)
    w = pack_pseg(a, cache=False)
    np.testing.assert_allclose(pseg_to_dense(w), a.to_scipy().toarray(),
                               rtol=0, atol=0)


def test_pseg_hybrid_pack_roundtrip():
    from sblas.retile_pseg import pack_pseg_hybrid, pseg_to_dense

    a = datasets.powerlaw_graph(3000, 8, seed=11, dtype=np.float32)
    w = pack_pseg_hybrid(a, cache=False)
    assert w is not None and w.n_hub_rounds >= 0
    assert w.num_rounds > w.n_hub_rounds  # has tail rounds
    np.testing.assert_allclose(pseg_to_dense(w), a.to_scipy().toarray(),
                               rtol=0, atol=0)


def test_spmv_pseg_hybrid_interpret():
    # hybrid hub+tail stream through the kernel (interpret mode): tail
    # rounds bind slot sublane to column panel (round 4)
    import jax
    from sblas.ops.kernels.spmv_pseg import PallasSpmvScattered

    g = datasets.emulate("uk-2002", scale=0.003, dtype=np.float32)
    p = PallasSpmvScattered(g, hybrid=True, min_fill=0.0)
    assert p.layout.n_hub_rounds >= 0
    assert p.layout.n_stragglers == 0
    x = np.random.default_rng(52).standard_normal(g.shape[1]).astype(
        np.float32)
    y = np.asarray(jax.jit(p.apply_pure)(p.device_arrays(), x))
    assert rel_err(y, spmv_golden(g, x)) < 1e-5
    # hybrid must pack at materially higher fill than plain divert=0
    plain = PallasSpmvScattered(g, hybrid=False, divert_below=0,
                                min_fill=0.0)
    assert p.layout.fill > plain.layout.fill


def test_pseg_trailing_empty_rows():
    """Regression (r2 review): rows after the last nonempty 1024-block had
    no y slot; the unpermute gather clamped them onto the last nonempty
    row's value."""
    from sblas.formats import COO, coo_to_csr
    from sblas.ops.kernels.spmv_pseg import PallasSpmvScattered

    rng = np.random.default_rng(0)
    m, n = 1500, 800
    rows = rng.integers(0, 1024, 30000)       # rows >= 1024 all empty
    cols = rng.integers(0, n, 30000)
    a = coo_to_csr(COO((m, n), rows, cols,
                       rng.standard_normal(30000).astype(np.float32)))
    p = PallasSpmvScattered(a.astype(np.float32), min_fill=0.0)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(p.apply_traced(x))
    assert np.all(y[1024:] == 0.0)
    assert rel_err(y, spmv_golden(a, x)) < 1e-4


def test_rcm_plan_call_inside_jit():
    """Regression (r2 review): rcm __call__ used np.asarray on the traced
    input — data-dependent jit breakage under method='auto'."""
    import jax

    from sblas.formats import CSR

    base = datasets.random_csr(2000, 2000, 40, bandwidth=60, seed=21,
                               dtype=np.float32)
    p_ = np.random.default_rng(22).permutation(2000)
    s = base.to_scipy().tocsr()[p_][:, p_].tocsr()
    s.sort_indices()
    a = CSR.from_scipy(s).astype(np.float32)
    plan = SpmvPlan(a, "rcm")
    x = np.random.default_rng(23).standard_normal(2000).astype(np.float32)
    y = np.asarray(jax.jit(lambda v: plan(v))(x))
    assert rel_err(y, spmv_golden(a, x)) < 1e-4
