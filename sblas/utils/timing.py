"""Timing & metrics harness (layer L4, SURVEY.md C13).

The reference times with cudaEvent around a K-iteration kernel loop. On this
TPU (tunneled single chip) naive dispatch-loop timing is unusable: dispatch
overhead is tens of ms and queued executions are hidden, so every measurement
here runs the op as *dependent* iterations inside one jitted
``lax.fori_loop`` with a dynamic trip count (one compile) and reports the
**marginal** cost between a low and a high iteration count — fixed
dispatch/transfer overhead cancels. Verified against STREAM triad on v5e
(~700-800 GB/s marginal, consistent with the 819 GB/s spec).

GFLOP/s and GB/s come from explicit per-routine flop/byte models
(2*nnz flops for SpMV; bytes from the plan's ``bytes_per_iter``), and
bandwidth is also reported as a fraction of *measured* STREAM, which is the
north-star metric (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass
class BenchRecord:
    name: str
    seconds_per_iter: float
    flops: float = 0.0
    bytes: float = 0.0
    extra: dict = dataclasses.field(default_factory=dict)

    @property
    def gflops(self) -> float:
        return self.flops / self.seconds_per_iter / 1e9

    @property
    def gbps(self) -> float:
        return self.bytes / self.seconds_per_iter / 1e9

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "seconds_per_iter": self.seconds_per_iter,
            "gflops": self.gflops,
            "gbps": self.gbps,
            **self.extra,
        }


def measure_seconds_per_iter(
    step: Callable, init, *args, iters_lo: int = 5, iters_hi: int = 25,
    repeats: int = 3,
) -> float:
    """Marginal seconds per iteration of ``step(carry, *args) -> carry``.

    ``step`` must return something of the same structure as its carry so the
    loop carries a data dependency (prevents elision/overlap/LICM of the
    loads that depend on the carry).

    All device arrays MUST be threaded through ``*args`` (pytrees fine), not
    closed over: on the axon remote-compile path, closure-captured arrays are
    embedded as HLO constants and shipped to the compiler — a 100 MB constant
    turns a 1 s compile into minutes (measured).

    Methodology: adaptive iteration growth. The axon tunnel adds tens of ms
    of dispatch overhead and has been observed to mis-report completion for
    short runs, so we grow the trip count until the k-iteration run takes
    clearly longer than the 1-iteration run (or a wall budget is hit), then
    report (t(k) - t(1)) / (k - 1). Raises RuntimeError if time never scales
    with k — a sign the device/tunnel is not executing the loop honestly.
    """

    @jax.jit
    def run(x, k, *a):
        return lax.fori_loop(0, k, lambda i, c: step(c, *a), x)

    def fetch(r):
        # jax.block_until_ready has been observed to return EARLY through the
        # axon tunnel (loop of 5120 iters "completing" in 0.1 ms); a value
        # readback is the only trustworthy completion barrier. The readback
        # round-trip is constant and cancels in the marginal measurement.
        leaf = jax.tree_util.tree_leaves(r)[0]
        import numpy as _np
        _np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))

    def timed(k):
        t0 = time.perf_counter()
        fetch(run(init, jnp.int32(k), *args))
        return time.perf_counter() - t0

    fetch(run(init, jnp.int32(1), *args))  # compile + warm
    t1 = min(timed(1), timed(1))
    k = max(iters_lo, 2)
    budget_t = max(20.0 * t1, 0.25)
    while True:
        tk = timed(k)
        if tk > 3.0 * t1 or tk > budget_t or k >= 4096:
            break
        k *= 4
    if tk <= 1.05 * t1 and k > 2:
        raise RuntimeError(
            f"iteration time did not scale (t1={t1:.4f}s, t{k}={tk:.4f}s); "
            "device timing is untrustworthy in this process"
        )
    best = (tk - t1) / (k - 1)
    for _ in range(max(repeats - 1, 0)):
        tk = timed(k)
        if tk > t1:
            best = min(best, (tk - t1) / (k - 1))
    return best


_STREAM_CACHE: dict = {}


def stream_bandwidth(nbytes_per_array: int = 256 * (1 << 20),
                     dtype=jnp.float32, *, fresh: bool = False) -> float:
    """Measured STREAM-triad bandwidth (GB/s) on the default device.

    This is the denominator of the north-star "% of STREAM-equivalent BW"
    metric — measured on the same chip with the same harness rather than
    assuming the 819 GB/s paper number.

    ``fresh=True`` bypasses (and refreshes) the per-process cache — used by
    the interleaved ratio protocol, which pairs each kernel sample with an
    adjacent STREAM sample so slow chip drift cancels in the ratio.
    """
    key = (nbytes_per_array, str(dtype), str(jax.devices()[0]))
    if not fresh and key in _STREAM_CACHE:
        return _STREAM_CACHE[key]
    n = nbytes_per_array // jnp.dtype(dtype).itemsize
    b = jnp.full((n,), 1.0, dtype)

    def triad(x, b):
        return x + 2.0 * b

    per = measure_seconds_per_iter(triad, jnp.zeros((n,), dtype), b,
                                   iters_lo=4, iters_hi=16, repeats=2)
    bw = 3 * n * jnp.dtype(dtype).itemsize / per / 1e9
    _STREAM_CACHE[key] = bw
    return bw
