"""CPU golden references and validation helpers (layer L4, SURVEY.md C12).

The reference embeds a serial CPU implementation in each driver and compares
with a relative-error tolerance; here the goldens are scipy/numpy and live in
one module shared by tests, benchmarks, and the CLI's --validate path.
"""

from __future__ import annotations

import numpy as np

from .formats import CSR


def spmv_golden(a: CSR, x, alpha: float = 1.0, beta: float = 0.0, y=None):
    """y_out = alpha * A @ x + beta * y (dense x, CSR A)."""
    x = np.asarray(x)
    base = a.to_scipy() @ x.astype(np.float64)
    out = alpha * base
    if beta != 0.0:
        if y is None:
            raise ValueError("beta != 0 requires y")
        out = out + beta * np.asarray(y, dtype=np.float64)
    return out.astype(x.dtype if x.dtype in (np.float32, np.float64) else np.float64)


def spmm_golden(a: CSR, x, alpha: float = 1.0, beta: float = 0.0, y=None):
    """Y_out = alpha * A @ X + beta * Y (row-major dense X of shape (n, k))."""
    return spmv_golden(a, x, alpha, beta, y)


def sptrsv_golden(l: CSR, b, *, lower: bool = True, unit_diagonal: bool = False):
    """Triangular solve L x = b via scipy (forward/backward substitution)."""
    from scipy.sparse.linalg import spsolve_triangular

    b64 = np.asarray(b, dtype=np.float64)
    x = spsolve_triangular(
        l.to_scipy().astype(np.float64).tocsr(), b64, lower=lower,
        unit_diagonal=unit_diagonal,
    )
    return x.astype(np.asarray(b).dtype)


def sptrsm_golden(l: CSR, b, *, lower: bool = True,
                  unit_diagonal: bool = False):
    """Multi-RHS triangular solve L X = B, B of shape (n, k), via scipy."""
    return sptrsv_golden(l, b, lower=lower, unit_diagonal=unit_diagonal)


def rel_err(approx, exact) -> float:
    """||approx - exact||_inf / max(||exact||_inf, tiny)."""
    approx = np.asarray(approx, dtype=np.float64)
    exact = np.asarray(exact, dtype=np.float64)
    denom = max(float(np.max(np.abs(exact))), 1e-30)
    return float(np.max(np.abs(approx - exact))) / denom


def default_tol(dtype) -> float:
    """Validation tolerance per dtype: loose enough for reassociated sums over
    long rows / multi-chip psum, tight enough to catch indexing bugs."""
    dtype = np.dtype(dtype)
    if dtype == np.float64:
        return 1e-11
    if dtype == np.float32:
        return 2e-5
    return 2e-2  # bf16
