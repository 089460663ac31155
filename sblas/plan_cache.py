"""Persistent preprocessed-matrix cache (SURVEY.md §5 checkpoint/resume
analogue).

Retiling/partitioning web-scale matrices is expensive host work that is
reused across runs; this module caches the packed layouts (w-SELL, ELL,
BSR, level schedules) as ``.npz`` files keyed by (matrix content hash,
layout kind, layout params). The cache is safe to delete at any time.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from .formats import CSR

_DEFAULT_DIR = os.environ.get(
    "SBLAS_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "sblas")
)


def matrix_digest(a: CSR) -> str:
    """Content hash of a CSR matrix (shape + structure + values)."""
    h = hashlib.sha256()
    h.update(json.dumps(a.shape).encode())
    for arr in (a.indptr, a.indices, a.data):
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:24]


def cached_arrays(
    a: CSR, kind: str, params: dict, build: Callable[[], dict],
    cache_dir: Optional[str] = None,
) -> dict:
    """Return ``build()``'s dict of numpy arrays, persisted across runs.

    ``params`` must uniquely determine the layout given the matrix.
    """
    root = Path(cache_dir or _DEFAULT_DIR)
    key = f"{kind}-{matrix_digest(a)}-" + hashlib.sha256(
        json.dumps(params, sort_keys=True).encode()
    ).hexdigest()[:12]
    path = root / f"{key}.npz"
    if path.exists():
        import logging

        logging.getLogger("sblas").info(
            "plan_cache hit: %s (skipping repack)", path.name
        )
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    out = build()
    assert all(isinstance(v, np.ndarray) for v in out.values()), (
        "cached_arrays expects a flat dict of numpy arrays"
    )
    root.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    # uncompressed: float layouts compress poorly and write speed matters
    np.savez(tmp, **out)
    os.replace(tmp, path)
    return out


def cache_enabled() -> bool:
    """Layout caching is on unless SBLAS_NO_CACHE is set."""
    return not os.environ.get("SBLAS_NO_CACHE")


# Matrices below this nnz are cheap to repack; caching them would just
# litter ~/.cache (tests generate thousands of tiny matrices).
MIN_CACHE_NNZ = 200_000
