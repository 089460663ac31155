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


def test_rejects_complex(tmp_path):
    p = tmp_path / "c.mtx"
    p.write_text("%%MatrixMarket matrix coordinate complex general\n1 1 1\n1 1 1 2\n")
    with pytest.raises(ValueError):
        read_mtx(p)
