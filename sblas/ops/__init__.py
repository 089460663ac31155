"""Device-side sparse BLAS ops (layer L2).

Public entry points mirror the reference's API surface (spmv/spmm/sptrsv over
CSR; BASELINE.json north_star). Each op follows the analysis/execute split the
reference uses for SpTRSV and cuSPARSE uses for all ops: a *plan* object owns
the retiled device arrays and a jitted executor; the convenience functions
build and cache a plan per (matrix, op, flavor).
"""

from __future__ import annotations

from .spmv import SpmvPlan, spmv
from .spmm import SpmmPlan, spmm
from .sptrsv import SptrsvPlan, sptrsv
from .sptrsm import SptrsmPlan, sptrsm

__all__ = [
    "SpmvPlan", "SpmmPlan", "SptrsvPlan", "SptrsmPlan",
    "spmv", "spmm", "sptrsv", "sptrsm",
]
