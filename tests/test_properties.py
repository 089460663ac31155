"""Randomized property tests (SURVEY.md §4): structure-perturbation
invariants across formats, layouts, and ops, seeded for reproducibility."""

import numpy as np
import pytest

from sblas import datasets
from sblas.formats import COO, CSR, coo_to_csr, csr_transpose
from sblas.golden import spmv_golden, rel_err
from sblas.ops.spmv import SpmvPlan


@pytest.mark.parametrize("seed", range(8))
def test_random_structure_roundtrip(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 400))
    n = int(rng.integers(1, 400))
    nnz = int(rng.integers(0, max(m * n // 4, 1)))
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    coo = COO((m, n), rows, cols, vals)
    csr = coo_to_csr(coo)
    # duplicates merged
    np.testing.assert_allclose(csr.todense(), coo.todense(), atol=1e-12)
    # transpose involution
    tt = csr_transpose(csr_transpose(csr))
    np.testing.assert_allclose(tt.todense(), csr.todense())
    # row permutation of input == permutation of output (SpMV linearity)
    if m and n and csr.nnz:
        x = rng.standard_normal(n)
        y = spmv_golden(csr, x)
        perm = rng.permutation(m)
        pc = csr.tocoo()
        inv = np.empty(m, dtype=np.int64)
        inv[perm] = np.arange(m)
        permuted = coo_to_csr(COO((m, n), inv[pc.row], pc.col, pc.data))
        yp = spmv_golden(permuted, x)
        np.testing.assert_allclose(yp[inv], y, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("seed", range(5))
def test_spmv_methods_agree_random(seed):
    rng = np.random.default_rng(100 + seed)
    m = int(rng.integers(16, 300))
    a = datasets.random_csr(m, m, float(rng.integers(1, 12)),
                            skew=float(rng.uniform(0, 1.5)),
                            seed=seed, dtype=np.float64)
    x = rng.standard_normal(m)
    ys = {meth: np.asarray(SpmvPlan(a, meth)(x))
          for meth in ("coo", "ell", "bucket", "bsr")}
    ref = spmv_golden(a, x)
    for meth, y in ys.items():
        assert rel_err(y, ref) < 1e-10, meth


@pytest.mark.parametrize("seed", range(4))
def test_wsell_pack_random_roundtrip(seed):
    from sblas.retile_wsell import pack_wsell, wsell_to_dense

    rng = np.random.default_rng(200 + seed)
    m = int(rng.integers(8, 200))
    n = int(rng.integers(8, 500))
    a = datasets.random_csr(m, n, float(rng.integers(1, 8)),
                            bandwidth=int(rng.integers(4, 60)),
                            seed=seed, dtype=np.float32)
    w = pack_wsell(a)
    np.testing.assert_allclose(wsell_to_dense(w), a.todense(), rtol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_wsell_native_matches_python(seed):
    """The C++ packer and the Python packer must produce equivalent layouts
    (same reconstruction; stats may differ only in round order)."""
    from sblas import native
    from sblas.retile_wsell import pack_wsell, wsell_to_dense

    if not native.have_native():
        pytest.skip("no native lib")
    rng = np.random.default_rng(300 + seed)
    m = int(rng.integers(16, 300))
    a = datasets.random_csr(m, m, 6, bandwidth=40, seed=seed,
                            dtype=np.float32)
    w_native = pack_wsell(a)  # f32 -> native path
    a64 = a.astype(np.float64)
    w_py = pack_wsell(a64)    # f64 -> python path
    np.testing.assert_allclose(wsell_to_dense(w_native),
                               wsell_to_dense(w_py).astype(np.float32),
                               rtol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_pseg_pack_random_roundtrip(seed):
    """PSEG (native or python builder) must reconstruct the matrix exactly,
    including stragglers, for arbitrary random structure."""
    from sblas.retile_pseg import pack_pseg, pseg_to_dense

    rng = np.random.default_rng(100 + seed)
    m = int(rng.integers(1, 600))
    n = int(rng.integers(1, 600))
    nnz = int(rng.integers(0, max(m * n // 6, 1)))
    coo = COO((m, n), rng.integers(0, m, nnz), rng.integers(0, n, nnz),
              rng.standard_normal(nnz).astype(np.float32))
    a = coo_to_csr(coo).astype(np.float32)
    w = pack_pseg(a, cache=False, divert_below=int(rng.integers(0, 64)))
    np.testing.assert_allclose(
        pseg_to_dense(w)[: a.shape[0], : a.shape[1]],
        a.to_scipy().toarray(), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_trans_csc_algebra_random(seed):
    """spmv over {CSR, CSC} x {trans, no-trans} all agree with scipy."""
    from sblas.formats import coo_to_csc
    from sblas.ops import spmv

    rng = np.random.default_rng(200 + seed)
    m = int(rng.integers(2, 300))
    n = int(rng.integers(2, 300))
    nnz = int(rng.integers(1, max(m * n // 5, 2)))
    coo = COO((m, n), rng.integers(0, m, nnz), rng.integers(0, n, nnz),
              rng.standard_normal(nnz).astype(np.float32))
    a = coo_to_csr(coo).astype(np.float32)
    c = coo_to_csc(a.tocoo())
    s = a.to_scipy().astype(np.float64)
    x = rng.standard_normal(n).astype(np.float32)
    xt = rng.standard_normal(m).astype(np.float32)
    for mat in (a, c):
        assert rel_err(np.asarray(spmv(mat, x)), s @ x) < 1e-4
        assert rel_err(np.asarray(spmv(mat, xt, trans=True)), s.T @ xt) < 1e-4
