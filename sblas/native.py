"""ctypes loader for the native C++ helpers (csrc/sblas_native.cpp).

Compiles the shared library on first use (g++, ~1 s) into the package
directory and caches it; every entry point has a numpy fallback so the
library works without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "sblas_native.cpp"
_LIB_DIR = Path(__file__).resolve().parent
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _SRC.exists():
        return None
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    so = _LIB_DIR / f"_sblas_native_{tag}.so"
    if not so.exists():
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(so), str(_SRC)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.sblas_level_schedule_lower.restype = ctypes.c_int32
    lib.sblas_level_schedule_lower.argtypes = [i32p, i32p, ctypes.c_int64, i32p]
    lib.sblas_level_schedule_upper.restype = ctypes.c_int32
    lib.sblas_level_schedule_upper.argtypes = [i32p, i32p, ctypes.c_int64, i32p]
    lib.sblas_parse_mtx_body.restype = ctypes.c_int64
    lib.sblas_parse_mtx_body.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        i32p, i32p, f64p,
    ]
    lib.sblas_sptrsv_lower_f64.restype = None
    lib.sblas_sptrsv_lower_f64.argtypes = [
        i32p, i32p, f64p, ctypes.c_int64, f64p, f64p, ctypes.c_int,
    ]
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.sblas_pack_wsell_f32.restype = ctypes.c_int64
    lib.sblas_pack_wsell_f32.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, f32p, i32p, i32p, i32p,
    ]
    lib.sblas_wsell_chunk_count.restype = ctypes.c_int64
    lib.sblas_wsell_chunk_count.argtypes = [i32p, i32p, ctypes.c_int64,
                                            ctypes.c_int32]
    lib.sblas_pack_trsv_f32.restype = ctypes.c_int64
    lib.sblas_pack_trsv_f32.argtypes = [
        i32p, i32p, f64p, i32p, i32p, f64p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32,
        f32p, i32p, i32p, i32p, i32p, i32p,
    ]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sblas_pack_pseg_f32.restype = ctypes.c_int64
    lib.sblas_pack_pseg_f32.argtypes = [
        i32p, i32p, i32p, i32p, i32p, f32p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        f32p, i32p, i32p, i32p, i32p, i64p, i64p,
    ]
    lib.sblas_ic0_f64.restype = ctypes.c_int64
    lib.sblas_ic0_f64.argtypes = [i32p, i32p, f64p, ctypes.c_int64]
    lib.sblas_ilu0_f64.restype = ctypes.c_int64
    lib.sblas_ilu0_f64.argtypes = [i32p, i32p, f64p, ctypes.c_int64]
    _lib = lib
    return _lib


def _as_i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _as_f64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def have_native() -> bool:
    return _build_and_load() is not None


def level_schedule(indptr: np.ndarray, indices: np.ndarray, n: int,
                   *, lower: bool = True) -> tuple[np.ndarray, int]:
    """Per-row dependency level of a triangular CSR matrix.

    Returns (levels[n] int32, nlevels). Native: one O(nnz) sweep. Fallback:
    numpy frontier relaxation, O(depth * nnz).
    """
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    lib = _build_and_load()
    if lib is not None:
        levels = np.zeros(n, dtype=np.int32)
        fn = (lib.sblas_level_schedule_lower if lower
              else lib.sblas_level_schedule_upper)
        nlev = fn(_as_i32p(indptr), _as_i32p(indices), n, _as_i32p(levels))
        return levels, int(nlev)
    return _level_schedule_numpy(indptr, indices, n, lower=lower)


def _level_schedule_numpy(indptr, indices, n, *, lower=True):
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    cols = indices.astype(np.int64)
    off = cols < rows if lower else cols > rows
    rows, cols = rows[off], cols[off]
    levels = np.zeros(n, dtype=np.int32)
    # Relax until fixpoint: level[i] = max(level[deps]) + 1.
    for _ in range(n + 1):
        cand = levels[cols] + 1
        new = np.zeros(n, dtype=np.int32)
        np.maximum.at(new, rows, cand)
        if np.array_equal(new, levels):
            break
        levels = np.maximum(levels, new)
    else:  # pragma: no cover
        raise RuntimeError("level schedule did not converge (cycle?)")
    return levels, int(levels.max(initial=-1)) + 1


def parse_mtx_body(body: bytes, nnz: int, has_value: bool):
    """Parse the body of a MatrixMarket coordinate file. Returns
    (rows, cols, vals) as int32/int32/float64 arrays, or None if native
    library unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    rows = np.empty(nnz, dtype=np.int32)
    cols = np.empty(nnz, dtype=np.int32)
    vals = np.empty(nnz, dtype=np.float64)
    got = lib.sblas_parse_mtx_body(
        body, len(body), nnz, int(has_value),
        _as_i32p(rows), _as_i32p(cols), _as_f64p(vals),
    )
    if got != nnz:
        raise ValueError(f"malformed .mtx body: parsed {got} of {nnz} entries")
    return rows, cols, vals


def sptrsv_golden_native(indptr, indices, data, b, *, unit_diagonal=False):
    """Serial CSR forward substitution in C++ (exact reference-style golden)."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    x = np.empty(n, dtype=np.float64)
    lib.sblas_sptrsv_lower_f64(
        _as_i32p(indptr), _as_i32p(indices), _as_f64p(data), n,
        _as_f64p(b), _as_f64p(x), int(unit_diagonal),
    )
    return x


def pack_wsell_rounds_f32(indptr, indices, data, m, sub, nwin):
    """Native w-SELL round builder. Returns (nrounds, val, lcol, wrow, obase)
    with val/lcol shaped (nrounds*8, 128), or None if no native library."""
    lib = _build_and_load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    max_rounds = lib.sblas_wsell_chunk_count(
        _as_i32p(indptr), _as_i32p(indices), m, sub) + 1
    val = np.empty((max_rounds * 8, 128), dtype=np.float32)
    lcol = np.empty((max_rounds * 8, 128), dtype=np.int32)
    wrow = np.empty(max_rounds, dtype=np.int32)
    obase = np.empty(max_rounds, dtype=np.int32)
    import ctypes as _ct

    f32p = _ct.POINTER(_ct.c_float)
    n = lib.sblas_pack_wsell_f32(
        _as_i32p(indptr), _as_i32p(indices),
        data.ctypes.data_as(f32p), m, sub, nwin, max_rounds,
        val.ctypes.data_as(f32p), _as_i32p(lcol), _as_i32p(wrow),
        _as_i32p(obase),
    )
    if n == -2:
        raise ValueError(f"w-SELL packer: unsupported sub={sub} "
                         "(must divide 128)")
    if n < 0:
        raise RuntimeError("w-SELL packer under-allocated (bug)")
    return int(n), val[: n * 8], lcol[: n * 8], wrow[:n], obase[:n]


def ic0_inplace(indptr, indices, data64) -> int:
    """Native IC(0) over the tril(A) CSR values (sorted cols, diag last in
    each row). Returns 0, or i+1 on a non-positive pivot at row i.
    Returns -1 when no native library is available (caller falls back)."""
    lib = _build_and_load()
    if lib is None:
        return -1
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    assert data64.dtype == np.float64 and data64.flags.c_contiguous
    return int(lib.sblas_ic0_f64(_as_i32p(indptr), _as_i32p(indices),
                                 _as_f64p(data64), len(indptr) - 1))


def ilu0_inplace(indptr, indices, data64) -> int:
    """Native ILU(0) over the full-pattern CSR values (sorted cols, full
    diagonal): in place, L unit-lower + U upper. Returns 0, or i+1 on a
    zero pivot / missing diagonal at row i. Returns -1 when no native
    library is available (caller falls back)."""
    lib = _build_and_load()
    if lib is None:
        return -1
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    assert data64.dtype == np.float64 and data64.flags.c_contiguous
    return int(lib.sblas_ilu0_f64(_as_i32p(indptr), _as_i32p(indices),
                                  _as_f64p(data64), len(indptr) - 1))


def pack_pseg_rounds(blk_s, tl_s, ts_s, pan_s, col_s, val_s, divert_below):
    """Native PSEG round builder over the (block, lane, panel)-sorted nnz
    stream. Returns (R, val, lcol, tsb, wrow, oblk, strag_idx) or None.
    val/lcol/tsb are (R*8, 128); strag_idx indexes the sorted stream."""
    lib = _build_and_load()
    if lib is None:
        return None
    import ctypes as _ct

    nnz = len(val_s)
    blk_s = np.ascontiguousarray(blk_s, dtype=np.int32)
    tl_s = np.ascontiguousarray(tl_s, dtype=np.int32)
    ts_s = np.ascontiguousarray(ts_s, dtype=np.int32)
    pan_s = np.ascontiguousarray(pan_s, dtype=np.int32)
    col_s = np.ascontiguousarray(col_s, dtype=np.int32)
    val_s = np.ascontiguousarray(val_s, dtype=np.float32)
    f32p = _ct.POINTER(_ct.c_float)
    i64p = _ct.POINTER(_ct.c_int64)
    n_strag = np.zeros(1, dtype=np.int64)
    # pass 1 — COUNT ONLY (null outputs): the worst case is one round per
    # nnz (divert=1), which once projected a 157 GiB preallocation on a
    # 85M-nnz hub stream; the counting pass is the same O(nnz) sweep
    nullf = _ct.cast(None, f32p)
    nulli = _ct.cast(None, _ct.POINTER(_ct.c_int32))
    nulll = _ct.cast(None, i64p)
    max_rounds = lib.sblas_pack_pseg_f32(
        _as_i32p(blk_s), _as_i32p(tl_s), _as_i32p(ts_s), _as_i32p(pan_s),
        _as_i32p(col_s), val_s.ctypes.data_as(f32p),
        nnz, int(divert_below), 0,
        nullf, nulli, nulli, nulli, nulli,
        nulll, n_strag.ctypes.data_as(i64p),
    )
    val = np.empty((max_rounds * 8, 128), dtype=np.float32)
    lcol = np.empty((max_rounds * 8, 128), dtype=np.int32)
    tsb = np.empty((max_rounds * 8, 128), dtype=np.int32)
    wrow = np.empty(max_rounds, dtype=np.int32)
    oblk = np.empty(max_rounds, dtype=np.int32)
    strag = np.empty(max(int(n_strag[0]), 1), dtype=np.int64)
    R = lib.sblas_pack_pseg_f32(
        _as_i32p(blk_s), _as_i32p(tl_s), _as_i32p(ts_s), _as_i32p(pan_s),
        _as_i32p(col_s), val_s.ctypes.data_as(f32p),
        nnz, int(divert_below), max_rounds,
        val.ctypes.data_as(f32p), _as_i32p(lcol), _as_i32p(tsb),
        _as_i32p(wrow), _as_i32p(oblk),
        strag.ctypes.data_as(i64p), n_strag.ctypes.data_as(i64p),
    )
    if R < 0 or R != max_rounds:
        raise RuntimeError("PSEG packer count/fill mismatch (bug)")
    ns = int(n_strag[0])
    return (int(R), val[: R * 8], lcol[: R * 8], tsb[: R * 8],
            wrow[:R], oblk[:R], strag[:ns])


def pack_trsv_rounds(indptr, indices, data, row_of_slot, slot_of_row,
                     inv_diag, n_pad, lower, dense_from_slot=None,
                     win=2):
    """Native SpTRSV round builder (see sptrsv_pallas.build_layout).
    Returns (R, val, lcol, wrow, oblk, final, bfirst) or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    import ctypes as _ct

    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    row_of_slot = np.ascontiguousarray(row_of_slot, dtype=np.int32)
    slot_of_row = np.ascontiguousarray(slot_of_row, dtype=np.int32)
    inv_diag = np.ascontiguousarray(inv_diag, dtype=np.float64)
    # worst case: total chunks (lps=8) + one per block
    max_rounds = lib.sblas_wsell_chunk_count(
        _as_i32p(indptr), _as_i32p(indices), len(indptr) - 1, 16
    ) + n_pad // 128 + 1
    f32p = _ct.POINTER(_ct.c_float)
    val = np.empty((max_rounds * 8, 128), dtype=np.float32)
    lcol = np.empty((max_rounds * 8, 128), dtype=np.int32)
    wrow = np.empty(max_rounds, dtype=np.int32)
    oblk = np.empty(max_rounds, dtype=np.int32)
    final = np.empty(max_rounds, dtype=np.int32)
    bfirst = np.empty(max_rounds, dtype=np.int32)
    if dense_from_slot is None:
        dense_from_slot = n_pad
    R = lib.sblas_pack_trsv_f32(
        _as_i32p(indptr), _as_i32p(indices), _as_f64p(data),
        _as_i32p(row_of_slot), _as_i32p(slot_of_row), _as_f64p(inv_diag),
        n_pad, int(lower), int(dense_from_slot), max_rounds, int(win),
        val.ctypes.data_as(f32p), _as_i32p(lcol), _as_i32p(wrow),
        _as_i32p(oblk), _as_i32p(final), _as_i32p(bfirst),
    )
    if R < 0:
        raise RuntimeError("trsv packer under-allocated (bug)")
    return (int(R), val[: R * 8], lcol[: R * 8], wrow[:R], oblk[:R],
            final[:R], bfirst[:R])
