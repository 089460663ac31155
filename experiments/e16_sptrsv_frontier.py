"""e16: SpTRSV absolute-performance frontier sweep (VERDICT r1 weak #5).

The single-RHS wavefront runs the 62k band factor at 0.81 ms = 39 GB/s =
~6% of STREAM. The ≥10x-vs-jnp target is crushed (>1500x), but the
absolute number is the flagship-solver frontier. This sweep measures the
two remaining structural knobs on the real chip:

  * nwin (panels per round window): fewer rounds vs more gather tables
    and a bigger Mosaic stack per round.
  * th (rounds per grid step): grid-step overhead vs VMEM stack height.

Usage: python experiments/e16_sptrsv_frontier.py
Writes one JSON line per config to stdout and e16_results.jsonl.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sblas import datasets
from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv, build_layout
from sblas.golden import sptrsv_golden, rel_err
from sblas.utils.timing import measure_seconds_per_iter


def bench_case(name, l, nwin, th):
    try:
        t0 = time.time()
        sv = PallasSptrsv(l, nwin=nwin, th=th)
        pack_s = time.time() - t0
    except Exception as e:
        return {"matrix": name, "nwin": nwin, "th": th,
                "fail": str(e)[:160]}
    rng = np.random.default_rng(0)
    b = rng.standard_normal(l.shape[0]).astype(np.float32)
    b2d = jnp.asarray(sv.b_to_b2d(b))
    arrs = sv.device_arrays()
    eps = 1e-30

    def step(carry, arrs_, b2d_):
        x2d = sv.solve_permuted(arrs_, b2d_ + carry * eps)
        return jnp.float32(eps) * x2d[0, 0]

    try:
        x2d = np.asarray(sv.solve_permuted(arrs, b2d))
        x = sv.x2d_to_x(x2d)
        err = float(rel_err(x, sptrsv_golden(l, b)))
        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, b2d,
                                       iters_lo=2, iters_hi=10)
    except Exception as e:
        return {"matrix": name, "nwin": nwin, "th": th,
                "fail": str(e)[:160]}
    lay = sv.layout
    rounds = lay.round_oblk.shape[0]
    return {"matrix": name, "nwin": nwin, "th": th,
            "rounds": int(rounds), "us": round(per * 1e6, 1),
            "ns_per_round": round(per / rounds * 1e9, 1),
            "rel_err": err, "pack_s": round(pack_s, 2)}


def main():
    out = Path(__file__).parent / "e16_results.jsonl"
    cases = [
        ("band-parallel", datasets.lower_triangular(
            62451, 30, bandwidth=4000, seed=1, dtype=np.float32)),
    ]
    spd = datasets.poisson2d_nd(120, dtype=np.float64)
    cases.append(("chol-nd-120", datasets.cholesky_factor(
        spd, dtype=np.float32)))

    for name, l in cases:
        for nwin in (8, 16, 32):
            for th in (128, 256, 512):
                rec = bench_case(name, l, nwin, th)
                print(json.dumps(rec), flush=True)
                with open(out, "a") as f:
                    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
