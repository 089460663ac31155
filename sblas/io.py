"""Matrix Market (.mtx) reader/writer (layer L0).

Covers the capability of the reference's ``mmio``-style loader (SURVEY.md C1):
coordinate format, real/integer/pattern fields, general/symmetric/skew-symmetric
symmetry, 1-based indices, ``%`` comments. Parsing is chunked numpy text
parsing rather than line-by-line C — fast enough for SuiteSparse-class files;
a C++ parser can replace the inner loop if web-scale graphs make this the
bottleneck (SURVEY.md C1 note).
"""

from __future__ import annotations

import gzip
from pathlib import Path
from typing import Union

import numpy as np

from .formats import COO, CSR, coo_to_csr

_FIELDS = {"real", "integer", "pattern", "double"}
_SYMMETRIES = {"general", "symmetric", "skew-symmetric"}


def _open(path: Union[str, Path]):
    path = Path(path)
    if path.suffix == ".gz":
        return gzip.open(path, "rt")
    return open(path, "r")


def read_mtx_coo(path: Union[str, Path], dtype=np.float64) -> COO:
    """Parse a Matrix Market coordinate file into COO (symmetry expanded)."""
    with _open(path) as f:
        header = f.readline().strip().lower().split()
        if len(header) < 5 or header[0] != "%%matrixmarket" or header[1] != "matrix":
            raise ValueError(f"not a MatrixMarket matrix file: {path}")
        fmt, field, symmetry = header[2], header[3], header[4]
        if fmt != "coordinate":
            raise ValueError(f"only coordinate format supported, got {fmt!r}")
        if field not in _FIELDS:
            raise ValueError(f"unsupported field {field!r} (complex not supported)")
        if symmetry not in _SYMMETRIES:
            raise ValueError(f"unsupported symmetry {symmetry!r}")

        # Skip comments, read size line.
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        m, n, nnz = (int(t) for t in line.split())

        # Bulk-parse the body. One big split is ~10x faster than per-line parsing.
        body = f.read()

    pattern = field == "pattern"
    parsed = None
    from . import native

    try:
        parsed = native.parse_mtx_body(body.encode(), nnz, not pattern)
    except ValueError:
        raise
    except Exception:
        parsed = None
    if parsed is not None:
        row64, col64, vals = parsed
        row = row64.astype(np.int64)
        col = col64.astype(np.int64)
        data = np.ones(nnz, dtype=dtype) if pattern else vals.astype(dtype)
    else:
        ncols = 2 if pattern else 3
        toks = np.array(body.split(), dtype=np.float64)
        if len(toks) < nnz * ncols:
            raise ValueError(
                f"truncated .mtx body: expected {nnz * ncols} tokens, "
                f"got {len(toks)}"
            )
        toks = toks[: nnz * ncols].reshape(nnz, ncols)
        row = toks[:, 0].astype(np.int64) - 1  # 1-based -> 0-based
        col = toks[:, 1].astype(np.int64) - 1
        data = np.ones(nnz, dtype=dtype) if pattern else toks[:, 2].astype(dtype)

    # 0-based or otherwise out-of-range indices must fail loudly, not wrap
    # through downstream gathers (ADVICE r1, low).
    if nnz and (row.min(initial=0) < 0 or col.min(initial=0) < 0
                or row.max(initial=-1) >= m or col.max(initial=-1) >= n):
        raise ValueError(
            f"index out of range in {path}: rows in "
            f"[{row.min() + 1}, {row.max() + 1}], cols in "
            f"[{col.min() + 1}, {col.max() + 1}] (1-based) vs shape {m}x{n}"
        )

    if symmetry in ("symmetric", "skew-symmetric"):
        off = row != col
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        row_full = np.concatenate([row, col[off]])
        col_full = np.concatenate([col, row[off]])
        data = np.concatenate([data, sign * data[off]])
        row, col = row_full, col_full

    return COO((m, n), row, col, data)


def read_mtx(path: Union[str, Path], dtype=np.float64) -> CSR:
    """Parse a .mtx file straight to canonical CSR (sorted, deduplicated)."""
    return coo_to_csr(read_mtx_coo(path, dtype=dtype))


def write_mtx(path: Union[str, Path], a, *, symmetry: str = "general") -> None:
    """Write COO/CSR as a MatrixMarket coordinate real file (1-based)."""
    coo = a.tocoo() if isinstance(a, CSR) else a
    if symmetry != "general":
        raise ValueError("only general symmetry supported for writing")
    path = Path(path)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{coo.shape[0]} {coo.shape[1]} {coo.nnz}\n")
        # Vectorized formatting via savetxt on a stacked array.
        stacked = np.column_stack(
            [coo.row.astype(np.int64) + 1, coo.col.astype(np.int64) + 1, coo.data]
        )
        np.savetxt(f, stacked, fmt="%d %d %.17g")
