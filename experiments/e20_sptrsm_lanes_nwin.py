"""e20: does the Lanes (multi-RHS) wavefront also want nwin=32?

e16 moved the single-RHS SpTRSV defaults to nwin=32/th=128 (rounds stop
shrinking past 32; band 654.9 µs). The Lanes kernel's VMEM stack grows
linearly in nwin (th*8*nwin*5 (8,128) temporaries), so wider windows force
a shorter tile height — this sweep measures whether fewer rounds still
wins under that constraint, at k=8 RHS.

Usage: python experiments/e20_sptrsm_lanes_nwin.py
Writes one JSON line per config to stdout and e20_results.jsonl.
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
from sblas.ops.kernels.sptrsv_pallas import PallasSptrsvLanes
from sblas.golden import sptrsm_golden, rel_err
from sblas.utils.timing import measure_seconds_per_iter

K = 8


def bench_case(name, l, nwin, th):
    try:
        t0 = time.time()
        sv = PallasSptrsvLanes(l, nwin=nwin, th=th)
        pack_s = time.time() - t0
    except Exception as e:
        return {"matrix": name, "nwin": nwin, "th": th,
                "fail": str(e)[:160]}
    rng = np.random.default_rng(0)
    b = rng.standard_normal((l.shape[0], K)).astype(np.float32)
    b3d = jnp.asarray(sv.b_to_b3d(b))
    arrs = sv.device_arrays()
    eps = 1e-30

    def step(carry, arrs_, b3d_):
        x2d = sv.solve_permuted(arrs_, b3d_ + carry * eps)
        return jnp.float32(eps) * x2d[0, 0]

    try:
        x2d = np.asarray(sv.solve_permuted(arrs, b3d))
        x = sv.x2d_to_x(x2d, K)
        err = float(rel_err(x, sptrsm_golden(l, b)))
        per = measure_seconds_per_iter(step, jnp.float32(0.0), arrs, b3d,
                                       iters_lo=2, iters_hi=10)
    except Exception as e:
        return {"matrix": name, "nwin": nwin, "th": th,
                "fail": str(e)[:160]}
    lay = sv.layout
    rounds = lay.round_oblk.shape[0]
    return {"matrix": name, "nwin": nwin, "th": int(lay.th),
            "th_req": th, "rounds": int(rounds),
            "us": round(per * 1e6, 1),
            "ns_per_round": round(per / rounds * 1e9, 1),
            "rel_err": err, "pack_s": round(pack_s, 2)}


def main():
    out = Path(__file__).parent / "e20_results.jsonl"
    cases = [
        ("band-parallel", datasets.lower_triangular(
            62451, 30, bandwidth=4000, seed=1, dtype=np.float32)),
    ]
    spd = datasets.poisson2d_nd(120, dtype=np.float64)
    cases.append(("chol-nd-120", datasets.cholesky_factor(
        spd, dtype=np.float32)))
    for name, l in cases:
        for nwin in (16, 32):
            for th in (2, 4, 8):
                rec = bench_case(name, l, nwin, th)
                print(json.dumps(rec), flush=True)
                with open(out, "a") as f:
                    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
