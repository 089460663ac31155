"""CLI smoke tests on the CPU backend."""
import json
import sys

import numpy as np
import pytest

from sblas.cli import main, _load_matrix


def test_load_matrix_specs():
    a = _load_matrix("poisson:8", 1.0, np.float32)
    assert a.shape == (64, 64)
    a = _load_matrix("band:50:3", 1.0, np.float64)
    assert a.shape == (50, 50)
    a = _load_matrix("tri:100:4", 1.0, np.float32)
    assert a.shape == (100, 100)
    a = _load_matrix("random:64:3", 1.0, np.float32)
    assert a.shape == (64, 64)


def test_cli_spmv(capsys, tmp_path):
    out = tmp_path / "r.json"
    rc = main(["spmv", "--matrix", "random:256:6", "--method", "ell",
               "--iters", "4", "--json", str(out)])
    assert rc == 0
    rec = json.loads(out.read_text().strip())
    assert rec["name"] == "spmv"
    assert rec["gflops"] > 0
    assert rec["rel_err"] < 1e-3


def test_cli_sptrsv(capsys, tmp_path):
    out = tmp_path / "r.json"
    rc = main(["sptrsv", "--matrix", "tri:256:4", "--iters", "4",
               "--json", str(out)])
    assert rc == 0
    rec = json.loads(out.read_text().strip())
    assert rec["name"] == "sptrsv"


def test_cli_dist_spmv(tmp_path):
    out = tmp_path / "r.json"
    rc = main(["dist-spmv", "--matrix", "random:256:6", "--iters", "4",
               "--strategy", "nnz_split", "--json", str(out)])
    assert rc == 0
    rec = json.loads(out.read_text().strip())
    assert rec["name"].startswith("dist_spmv")


def test_cli_sptrsm(tmp_path):
    out = tmp_path / "r.json"
    rc = main(["sptrsm", "--matrix", "tri:256:4", "--k", "4", "--iters", "4",
               "--json", str(out)])
    assert rc == 0
    rec = json.loads(out.read_text().strip())
    assert rec["name"] == "sptrsm_k4"
    assert rec["rel_err"] < 1e-3


def test_cli_dist_spmv_2d(tmp_path):
    out = tmp_path / "r.json"
    rc = main(["dist-spmv", "--matrix", "random:512:5", "--mesh2d", "2x4",
               "--iters", "3", "--json", str(out)])
    assert rc == 0
    rec = json.loads(out.read_text().strip())
    assert rec["name"] == "dist_spmv2d_2x4"
    assert rec["rel_err"] < 1e-5


def test_cli_solve(tmp_path):
    out = tmp_path / "r.json"
    rc = main(["solve", "--matrix", "poisson:24", "--precond", "ichol",
               "--tol", "1e-5", "--json", str(out)])
    assert rc == 0
    rec = json.loads(out.read_text().strip())
    assert rec["name"] == "cg_ichol"
    assert rec["true_rel_err"] < 1e-4
