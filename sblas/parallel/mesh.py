"""Mesh helpers: 1D 'chips' axis over whatever devices exist."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

chips_axis = "chips"


def make_mesh(ndev: int | None = None) -> Mesh:
    """1D mesh over the first ``ndev`` devices (default: all)."""
    devs = jax.devices()
    if ndev is None:
        ndev = len(devs)
    if ndev > len(devs):
        raise ValueError(f"requested {ndev} devices, have {len(devs)}")
    return Mesh(np.array(devs[:ndev]), (chips_axis,))
