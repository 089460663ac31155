import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

from sblas.io import read_mtx, read_mtx_coo, write_mtx
from sblas.formats import CSR


def test_read_general(tmp_path):
    p = tmp_path / "a.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "3 4 5\n"
        "1 1 1.5\n"
        "1 4 -2\n"
        "2 2 3e2\n"
        "3 1 0.25\n"
        "3 3 7\n"
    )
    a = read_mtx(p)
    dense = np.zeros((3, 4))
    dense[0, 0], dense[0, 3], dense[1, 1], dense[2, 0], dense[2, 2] = 1.5, -2, 300, 0.25, 7
    np.testing.assert_allclose(a.todense(), dense)


def test_read_symmetric(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 4\n"
        "1 1 2\n"
        "2 1 -1\n"
        "3 2 4\n"
        "3 3 5\n"
    )
    a = read_mtx(p)
    dense = np.array([[2, -1, 0], [-1, 0, 4], [0, 4, 5]], dtype=float)
    np.testing.assert_allclose(a.todense(), dense)


def test_read_skew_symmetric(tmp_path):
    p = tmp_path / "k.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 1\n"
        "2 1 3\n"
    )
    a = read_mtx(p)
    np.testing.assert_allclose(a.todense(), [[0, -3], [3, 0]])


def test_read_pattern(tmp_path):
    p = tmp_path / "p.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 2 2\n"
        "1 2\n"
        "2 1\n"
    )
    a = read_mtx(p)
    np.testing.assert_allclose(a.todense(), [[0, 1], [1, 0]])


@pytest.mark.parametrize("seed", range(3))
def test_roundtrip_vs_scipy_mmio(tmp_path, seed):
    rng = np.random.RandomState(seed)
    s = sp.random(50, 40, density=0.1, random_state=rng, format="coo")
    p = tmp_path / "r.mtx"
    sio.mmwrite(p, s)  # scipy writes the canonical format
    target = p if p.exists() else tmp_path / "r.mtx.gz"
    a = read_mtx(target)
    np.testing.assert_allclose(a.todense(), s.toarray(), rtol=1e-12)


def test_write_then_scipy_reads(tmp_path):
    rng = np.random.RandomState(3)
    s = sp.random(20, 30, density=0.2, random_state=rng, format="csr")
    ours = CSR.from_scipy(s)
    p = tmp_path / "w.mtx"
    write_mtx(p, ours)
    back = sio.mmread(p)
    np.testing.assert_allclose(back.toarray(), s.toarray(), rtol=1e-12)


def test_gzip(tmp_path):
    import gzip

    body = (
        "%%MatrixMarket matrix coordinate real general\n"
        "1 1 1\n"
        "1 1 42\n"
    )
    p = tmp_path / "g.mtx.gz"
    with gzip.open(p, "wt") as f:
        f.write(body)
    a = read_mtx_coo(p)
    assert a.data[0] == 42


def test_read_complex_general(tmp_path):
    p = tmp_path / "c.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate complex general\n"
        "2 2 2\n"
        "1 1 1.5 -2\n"
        "2 1 0 3\n"
    )
    a = read_mtx(p)
    assert a.dtype == np.complex128
    np.testing.assert_allclose(a.todense(), [[1.5 - 2j, 0], [3j, 0]])


def test_read_hermitian(tmp_path):
    p = tmp_path / "h.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate complex hermitian\n"
        "2 2 2\n"
        "1 1 2 0\n"
        "2 1 1 -4\n"
    )
    a = read_mtx(p)
    np.testing.assert_allclose(a.todense(), [[2, 1 + 4j], [1 - 4j, 0]])


def test_read_array_general(tmp_path):
    p = tmp_path / "a.mtx"
    # Column-major: matrix [[1, 3], [2, 0], [0, 4]]
    p.write_text(
        "%%MatrixMarket matrix array real general\n"
        "3 2\n"
        "1\n2\n0\n3\n0\n4\n"
    )
    a = read_mtx(p)
    np.testing.assert_allclose(a.todense(), [[1, 3], [2, 0], [0, 4]])
    assert a.nnz == 4  # explicit zeros dropped


def test_array_pattern_rejected(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix array pattern general\n2 2\n")
    with pytest.raises(ValueError):
        read_mtx(p)


# Parity corpus vs scipy.io — every (format, field, symmetry) combo scipy can
# itself generate (SURVEY.md C1 "mmio-class loaders handle both").
def _sym_dense(rng, n, kind, cplx):
    a = rng.standard_normal((n, n))
    if cplx:
        a = a + 1j * rng.standard_normal((n, n))
    if kind == "symmetric":
        return a + a.T
    if kind == "skew-symmetric":
        return a - a.T
    if kind == "hermitian":
        h = a + np.conj(a.T)
        return h
    return a


@pytest.mark.parametrize("field", ["real", "complex", "integer"])
@pytest.mark.parametrize(
    "symmetry", ["general", "symmetric", "skew-symmetric", "hermitian"]
)
@pytest.mark.parametrize("fmt", ["coordinate", "array"])
def test_scipy_parity_corpus(tmp_path, field, symmetry, fmt):
    if symmetry == "hermitian" and field != "complex":
        pytest.skip("hermitian requires complex field")
    if field == "integer" and symmetry != "general":
        pytest.skip("keep the integer corpus small")
    rng = np.random.default_rng(hash((field, symmetry, fmt)) % 2**32)
    n = 12
    dense = _sym_dense(rng, n, symmetry, cplx=field == "complex")
    if field == "integer":
        dense = np.round(dense * 10)
    # Sparsify ~50% (symmetrically, to preserve the symmetry class).
    mask = rng.random((n, n)) < 0.5
    mask = mask & mask.T
    if symmetry == "skew-symmetric":
        np.fill_diagonal(mask, False)
    dense = dense * mask

    p = tmp_path / "m.mtx"
    if fmt == "coordinate":
        sio.mmwrite(p, sp.coo_matrix(dense), field=field, symmetry=symmetry)
    else:
        sio.mmwrite(p, dense, field=field, symmetry=symmetry)
    got = read_mtx(p).todense()
    want = sio.mmread(p)
    if sp.issparse(want):
        want = want.toarray()
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)


def test_write_complex_then_scipy_reads(tmp_path):
    rng = np.random.default_rng(7)
    dense = (rng.standard_normal((9, 7)) + 1j * rng.standard_normal((9, 7)))
    dense[rng.random((9, 7)) < 0.6] = 0
    ours = CSR.from_scipy(sp.csr_matrix(dense))
    p = tmp_path / "wc.mtx"
    write_mtx(p, ours)
    back = sio.mmread(p)
    np.testing.assert_allclose(back.toarray(), dense, rtol=1e-12)


def test_read_mtx_dense_helper(tmp_path):
    from sblas.io import read_mtx_dense

    p = tmp_path / "d.mtx"
    sio.mmwrite(p, np.array([[1.0, 0.0], [2.0, 3.0]]))
    np.testing.assert_allclose(read_mtx_dense(p), [[1, 0], [2, 3]])
