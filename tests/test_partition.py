import numpy as np
import pytest

from sblas import datasets
from sblas.partition import (
    partition_rows, partition_nnz_split, validate_partition,
)


@pytest.mark.parametrize("strategy", ["even_rows", "nnz_balanced"])
@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_row_partition_invariants(strategy, ndev):
    a = datasets.random_csr(500, 400, 7, skew=0.8, seed=1)
    part = partition_rows(a, ndev, strategy)
    validate_partition(a, part)
    # reconstruction
    dense = np.vstack([p.todense() for p in part.parts])
    np.testing.assert_allclose(dense, a.todense())


def test_nnz_balance_quality():
    a = datasets.random_csr(2000, 2000, 10, skew=1.0, seed=2)
    even = partition_rows(a, 8, "even_rows")
    bal = partition_rows(a, 8, "nnz_balanced")
    assert bal.balance() <= even.balance() + 1e-9
    assert bal.balance() < 1.5


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_nnz_split_reconstruction(ndev):
    a = datasets.random_csr(300, 250, 6, seed=3)
    part = partition_nnz_split(a, ndev)
    # nnz counts exactly balanced (within 1)
    counts = np.diff(part.nnz_starts)
    assert counts.max() - counts.min() <= 1
    # reconstruction: sum of per-device partial dense matrices
    dense = np.zeros(a.shape)
    for d, p in enumerate(part.parts):
        if p.shape[0] == 0:
            continue
        r0 = int(part.first_row[d])
        dense[r0: r0 + p.shape[0]] += p.todense()
    np.testing.assert_allclose(dense, a.todense())


def test_nnz_split_cuts_heavy_row():
    # single dense row must be cut across devices
    from sblas.formats import COO, coo_to_csr

    rng = np.random.default_rng(4)
    a = coo_to_csr(COO((4, 100), np.zeros(100, np.int64),
                       np.arange(100), rng.standard_normal(100)))
    part = partition_nnz_split(a, 4)
    assert all(p.nnz == 25 for p in part.parts)
    assert np.all(part.first_row == 0)
