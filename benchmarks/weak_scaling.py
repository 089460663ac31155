"""Weak-scaling SpMV/SpMM harness (BASELINE config #5: uk-2002/twitter7-like
graphs, per-chip work held constant as the mesh grows).

Without a pod this runs on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) and demonstrates the
harness + partition quality; on a real v5e-8/16/32 the same script reports
true ICI scaling. Writes JSONL into benchmarks/results/.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-chip", type=int, default=100_000)
    ap.add_argument("--avg-deg", type=float, default=16.0)
    ap.add_argument("--kind", choices=["powerlaw", "fem"], default="powerlaw")
    ap.add_argument("--chips", default="1,2,4,8")
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force the virtual CPU mesh")
    args = ap.parse_args()

    import jax

    # Decide the platform BEFORE any device API touches the backend: on this
    # environment merely calling jax.device_count() initializes the tunneled
    # TPU client and collides with concurrent TPU jobs.
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    elif jax.device_count() == 1:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from sblas import datasets
    from sblas.parallel import DistSpmvPlan, make_mesh
    from sblas.golden import spmv_golden, rel_err
    from sblas.utils.timing import measure_seconds_per_iter

    out = Path(__file__).parent / "results" / f"weak_{int(time.time())}.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)

    chip_counts = [int(c) for c in args.chips.split(",")
                   if int(c) <= jax.device_count()]
    results = []
    for nc in chip_counts:
        n = args.rows_per_chip * nc
        if args.kind == "powerlaw":
            a = datasets.powerlaw_graph(n, avg_deg=args.avg_deg, seed=nc,
                                        dtype=np.float32)
        else:
            a = datasets.random_csr(n, n, args.avg_deg,
                                    bandwidth=int(args.avg_deg * 3),
                                    seed=nc, dtype=np.float32)
        mesh = make_mesh(nc)
        plan = DistSpmvPlan(a, mesh, strategy="nnz_balanced")
        x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        y = np.asarray(plan(x))
        err = rel_err(y, spmv_golden(a, x))

        run = plan._run
        x_pad0 = jnp.zeros(plan.n_pad, jnp.float32).at[:n].set(jnp.asarray(x))
        x_pad0 = jax.device_put(x_pad0, plan._x_sharding)

        def step(xp, col, val, x_pad0):
            yv = run(col, val, xp)
            return x_pad0 + 1e-30 * jnp.pad(yv, (0, plan.n_pad - n))[: plan.n_pad]

        per = measure_seconds_per_iter(step, x_pad0, plan._col, plan._val,
                                       x_pad0, iters_lo=2, iters_hi=8,
                                       repeats=2)
        rec = {"chips": nc, "n": n, "nnz": a.nnz, "seconds_per_iter": per,
               "gflops": 2 * a.nnz / per / 1e9, "rel_err": err,
               "nnz_balance": plan.nnz_balance,
               "backend": jax.default_backend()}
        results.append(rec)
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    if len(results) > 1:
        base = results[0]
        for r in results[1:]:
            # weak scaling: per-chip work constant -> ideal time is flat
            r["weak_efficiency"] = base["seconds_per_iter"] / r["seconds_per_iter"]
        print("# weak efficiency:",
              {r["chips"]: round(r.get("weak_efficiency", 1.0), 3)
               for r in results}, flush=True)


if __name__ == "__main__":
    main()
