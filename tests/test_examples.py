"""The examples must keep working — they are the library's front door."""

import runpy
from pathlib import Path

import numpy as np

from sblas import datasets

_EX = Path(__file__).resolve().parent.parent / "examples"


def test_cg_and_ssor_pcg():
    mod = runpy.run_path(str(_EX / "cg.py"))
    a = datasets.poisson2d(24, dtype=np.float32)
    b = np.random.default_rng(1).standard_normal(a.shape[0]).astype(
        np.float32)
    x, it, res = mod["cg"](a, b, tol=1e-5)
    assert res < 1e-5
    xp, itp, resp = mod["cg"](a, b, tol=1e-5,
                              m_solve=mod["ssor_preconditioner"](a))
    assert resp < 1e-5
    assert itp < it, "SSOR preconditioning must reduce iterations"
    err = np.linalg.norm(a.to_scipy() @ xp - b) / np.linalg.norm(b)
    assert err < 5e-5
