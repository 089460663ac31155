import numpy as np
import pytest
import scipy.sparse as sp

from sblas.formats import (
    COO, CSR, coo_to_csr, coo_to_csc, csr_transpose, tril, triu,
    has_full_diagonal,
)


def random_scipy(m, n, density, seed, dtype=np.float64):
    rng = np.random.default_rng(seed)
    mat = sp.random(m, n, density=density, random_state=np.random.RandomState(seed),
                    format="coo", dtype=dtype)
    mat.data = rng.standard_normal(len(mat.data)).astype(dtype)
    return mat


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("shape", [(10, 10), (37, 53), (128, 17), (1, 1), (200, 3)])
def test_coo_csr_roundtrip_vs_scipy(shape, seed):
    m, n = shape
    s = random_scipy(m, n, 0.15, seed)
    ours = coo_to_csr(COO((m, n), s.row, s.col, s.data))
    ref = s.tocsr()
    ref.sort_indices()
    ref.sum_duplicates()
    np.testing.assert_array_equal(ours.indptr, ref.indptr)
    np.testing.assert_array_equal(ours.indices, ref.indices)
    np.testing.assert_allclose(ours.data, ref.data)
    # Back to COO and dense.
    np.testing.assert_allclose(ours.todense(), s.toarray())


def test_duplicate_merge():
    a = COO((3, 3), [0, 0, 1, 2, 2, 2], [1, 1, 0, 2, 2, 2], [1.0, 2.0, 5.0, 1.0, 1.0, 1.0])
    csr = coo_to_csr(a)
    assert csr.nnz == 3
    dense = csr.todense()
    assert dense[0, 1] == 3.0
    assert dense[2, 2] == 3.0


@pytest.mark.parametrize("seed", range(3))
def test_csc_and_transpose(seed):
    s = random_scipy(40, 25, 0.2, seed)
    coo = COO(s.shape, s.row, s.col, s.data)
    csr = coo_to_csr(coo)
    csc = coo_to_csc(coo)
    ref_csc = s.tocsc()
    ref_csc.sort_indices()
    ref_csc.sum_duplicates()
    np.testing.assert_array_equal(csc.indptr, ref_csc.indptr)
    np.testing.assert_array_equal(csc.indices, ref_csc.indices)
    np.testing.assert_allclose(csc.data, ref_csc.data)
    # transpose
    t = csr_transpose(csr)
    np.testing.assert_allclose(t.todense(), s.toarray().T)
    # csc -> csr
    np.testing.assert_allclose(csc.tocsr().todense(), s.toarray())
    # csr -> csc
    c2 = csr.tocsc()
    np.testing.assert_allclose(c2.todense(), s.toarray())


def test_empty_rows_and_cols():
    coo = COO((5, 5), [1, 3], [2, 0], [1.5, -2.0])
    csr = coo_to_csr(coo)
    assert csr.nnz == 2
    assert list(csr.row_lengths) == [0, 1, 0, 1, 0]
    np.testing.assert_allclose(csr.todense(), coo.todense())
    t = csr_transpose(csr)
    np.testing.assert_allclose(t.todense(), coo.todense().T)


@pytest.mark.parametrize("k", [-1, 0, 1])
def test_triangular_extract(k):
    s = random_scipy(30, 30, 0.3, 7)
    csr = CSR.from_scipy(s.tocsr())
    lo = tril(csr, k=k)
    hi = triu(csr, k=k)
    np.testing.assert_allclose(lo.todense(), np.tril(s.toarray(), k=k))
    np.testing.assert_allclose(hi.todense(), np.triu(s.toarray(), k=k))


def test_unit_diagonal_tril():
    dense = np.array([[2.0, 1.0], [3.0, 4.0]])
    s = sp.csr_matrix(dense)
    lo = tril(CSR.from_scipy(s), unit_diagonal=True)
    out = lo.todense()
    assert out[0, 0] == 1.0 and out[1, 1] == 1.0 and out[1, 0] == 3.0
    assert out[0, 1] == 0.0


def test_has_full_diagonal():
    a = sp.eye(4).tocsr()
    assert has_full_diagonal(CSR.from_scipy(a))
    b = sp.csr_matrix((4, 4))
    assert not has_full_diagonal(CSR.from_scipy(b))


def test_scipy_interop():
    s = random_scipy(20, 20, 0.2, 1)
    csr = CSR.from_scipy(s.tocsr())
    back = csr.to_scipy()
    np.testing.assert_allclose(back.toarray(), s.toarray())


def test_int32_overflow_guard():
    with pytest.raises(ValueError):
        COO((1, 1), np.array([2**33]), np.array([0]), np.array([1.0]))


def test_dtype_preserved():
    coo = COO((2, 2), [0, 1], [0, 1], np.array([1.0, 2.0], dtype=np.float32))
    assert coo_to_csr(coo).dtype == np.float32
