"""Weak-scaling SpMV harness (BASELINE config #5: uk-2002/twitter7-like
graphs, per-chip work held constant as the mesh grows).

On the virtual CPU mesh (no pod available here) wall-clock is meaningless —
8 "chips" share the same socket — so records carry ``correctness_only: true``
and report what IS meaningful on a fake backend: validation vs the scipy
golden, nnz balance across shards, and the per-chip stream-bytes model
(which is what determines real weak scaling once the collectives ride ICI).
On a real v5e-8/16/32 the same script measures per-chip bandwidth and the
BASELINE criterion ("per-chip BW within 20% of 1-chip") directly.
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
    ap.add_argument("--plan",
                    choices=["1d", "2d", "halo", "sptrsv", "sptrsm", "cg",
                             "spmm"],
                    default="1d",
                    help="1d = row split + x all_gather; 2d = (rows, cols) "
                         "mesh, x sharded over cols, psum of partial y; "
                         "halo = neighbor ppermute strips (band-local "
                         "matrices, collective bytes independent of n); "
                         "sptrsv/sptrsm = distributed triangular solve "
                         "(level-batched, solved-slot-only exchange); "
                         "cg = distributed PCG end-to-end (one jitted "
                         "while_loop; iteration count must match the "
                         "single-chip solver); "
                         "spmm = row split + X all_gather, K RHS "
                         "(BASELINE config #5 names weak-scaling SpMM "
                         "explicitly)")
    ap.add_argument("--nrhs", type=int, default=8,
                    help="RHS count for --plan sptrsm / spmm")
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force the virtual CPU mesh")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os

    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8"
                                   ).strip()

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
    from sblas.parallel import (DistSpmvPlan, Dist2DSpmvPlan, HaloSpmvPlan,
                                DistSptrsvPlan, DistSptrsmPlan)
    from sblas.parallel.mesh import make_mesh, make_mesh2d
    from sblas.golden import (spmv_golden, sptrsv_golden, sptrsm_golden,
                              rel_err)
    from sblas.utils.timing import measure_seconds_per_iter

    correctness_only = jax.default_backend() == "cpu"
    out = Path(args.out) if args.out else (
        Path(__file__).parent / "results" / f"weak_{int(time.time())}.jsonl"
    )
    out.parent.mkdir(parents=True, exist_ok=True)

    chip_counts = [int(c) for c in args.chips.split(",")
                   if int(c) <= jax.device_count()]

    if args.plan in ("sptrsv", "sptrsm"):
        # Distributed triangular solve weak scaling (VERDICT r1 item 10):
        # correctness + the collective-bytes model. The solved-slot-only
        # exchange moves ~2x the padded solution size, independent of level
        # count (DESIGN.md "Dist SpTRSV") — record the measured ratio.
        for nc in chip_counts:
            n = args.rows_per_chip * nc
            l = datasets.lower_triangular(n, args.avg_deg, seed=nc,
                                          dtype=np.float32)
            mesh = make_mesh(nc)
            rng = np.random.default_rng(0)
            if args.plan == "sptrsv":
                plan = DistSptrsvPlan(l, mesh)
                base = plan
                b = rng.standard_normal(n).astype(np.float32)
                x = np.asarray(plan(b))
                err = rel_err(x, sptrsv_golden(l, b))
                rhs_mult = 1
            else:
                plan = DistSptrsmPlan(l, mesh)
                base = plan._sv
                b = rng.standard_normal((n, args.nrhs)).astype(np.float32)
                x = np.asarray(plan(b))
                err = rel_err(x, sptrsm_golden(l, b))
                rhs_mult = args.nrhs
            coll = int(base.collective_bytes) * rhs_mult
            model = 2 * 4 * n * rhs_mult   # ~2x solution size, f32
            rec = {
                "chips": nc, "n": n, "nnz": l.nnz, "plan": args.plan,
                "rel_err": float(err),
                "nlevels": int(base.nlevels),
                "nbatches": int(base.nbatches),
                "stream_bytes_per_chip": int(base.bytes_per_iter // nc),
                "collective_bytes": coll,
                "collective_model_2x_solution": model,
                "collective_vs_model": round(coll / max(model, 1), 3),
                "backend": jax.default_backend(),
                "correctness_only": correctness_only,
            }
            if args.plan == "sptrsm":
                rec["nrhs"] = args.nrhs
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        return

    if args.plan == "cg":
        # Distributed-solver weak scaling: the whole Krylov loop on the
        # mesh. On the CPU mesh the meaningful invariants are (a) the
        # iteration count matches the single-chip solver bit-for-bit-ish
        # (same algorithm, psum reassociation only), (b) the residual
        # converges, (c) the per-iteration collective model: one x
        # all_gather (n*4 bytes into each chip) + two psum'd dots.
        from sblas import solvers
        from sblas.parallel import dist_cg

        for nc in chip_counts:
            side = max(int(np.sqrt(args.rows_per_chip * nc)), 4)
            a = datasets.poisson2d(side, dtype=np.float32)
            n = a.shape[0]
            mesh = make_mesh(nc)
            b = np.random.default_rng(0).standard_normal(n).astype(
                np.float32)
            plan = DistSpmvPlan(a, mesh, strategy="nnz_balanced")
            t0 = time.time()
            x, info = dist_cg(plan, b, tol=1e-5, maxiter=4000)
            dt = time.time() - t0
            _, sinfo = solvers.cg(a, b, tol=1e-5, maxiter=4000,
                                  method="ell")
            res = float(np.linalg.norm(a.to_scipy() @ np.asarray(x) - b)
                        / np.linalg.norm(b))
            rec = {
                "chips": nc, "n": n, "nnz": a.nnz, "plan": "cg",
                "iterations": info["iterations"],
                "iterations_single_chip": sinfo["iterations"],
                "rel_residual": info["rel_residual"],
                "true_rel_err": res,
                "solve_seconds": round(dt, 3),
                "allgather_bytes_per_chip_per_iter": 4 * n,
                "local_method": plan.local_method,
                "backend": jax.default_backend(),
                "correctness_only": correctness_only,
            }
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        return

    if args.plan == "spmm":
        # Weak-scaling SpMM (VERDICT r3 item 6): same 1D nnz-balanced row
        # split + X all_gather as --plan 1d, with K RHS amortizing the
        # matrix stream. Per-chip schedule bytes are k-independent; the
        # gather collective scales with k — both recorded so the roofline
        # is checkable per chip count.
        from sblas.parallel import DistSpmmPlan
        from sblas.golden import spmm_golden

        for nc in chip_counts:
            n = args.rows_per_chip * nc
            if args.kind == "powerlaw":
                a = datasets.powerlaw_graph(n, avg_deg=args.avg_deg,
                                            seed=nc, dtype=np.float32)
            else:
                a = datasets.random_csr(n, n, args.avg_deg,
                                        bandwidth=int(args.avg_deg * 3),
                                        seed=nc, dtype=np.float32)
            mesh = make_mesh(nc)
            plan = DistSpmmPlan(a, mesh, strategy="nnz_balanced")
            x = np.random.default_rng(0).standard_normal(
                (n, args.nrhs)).astype(np.float32)
            y = np.asarray(plan(x))
            err = rel_err(y, spmm_golden(a, x))
            rec = {
                "chips": nc, "n": n, "nnz": a.nnz, "plan": "spmm",
                "k": args.nrhs,
                "rel_err": float(err),
                "local_method": plan.local_method,
                "stream_bytes_per_chip": int(
                    plan.bytes_per_iter_nx // nc),
                "x_gather_bytes_per_chip": int(
                    (plan.n_pad - plan.x_chunk) * 4 * args.nrhs),
                "backend": jax.default_backend(),
                "correctness_only": correctness_only,
            }
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        return

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
        if args.plan == "2d":
            r = int(np.sqrt(nc))
            while nc % r:
                r -= 1
            mesh = make_mesh2d(r, nc // r)
            plan = Dist2DSpmvPlan(a, mesh)
        elif args.plan == "halo":
            mesh = make_mesh(nc)
            plan = HaloSpmvPlan(a, mesh)
        else:
            mesh = make_mesh(nc)
            plan = DistSpmvPlan(a, mesh, strategy="nnz_balanced")
        x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        y = np.asarray(plan(x))
        err = rel_err(y, spmv_golden(a, x))

        rec = {
            "chips": nc, "n": n, "nnz": a.nnz,
            "plan": args.plan,
            "rel_err": float(err),
            "nnz_balance": float(getattr(plan, "nnz_balance", 1.0)),
            "local_method": plan.local_method,
            "stream_bytes_per_chip": int(plan.bytes_per_iter // nc),
            "backend": jax.default_backend(),
            "correctness_only": correctness_only,
        }
        if args.plan == "2d":
            R, C = plan.grid
            y_local = getattr(plan, "rows_pad",
                              n // max(R, 1))  # partial-y length per chip
            rec["grid"] = f"{R}x{C}"
            rec["psum_bytes_per_chip"] = int(
                2 * (C - 1) / max(C, 1) * y_local * 4)
        elif args.plan == "halo":
            rec["halo"] = int(plan.halo)
            rec["collective_bytes_per_chip"] = int(
                plan.collective_bytes_per_chip)
        else:
            rec["x_gather_bytes_per_chip"] = int(
                (plan.n_pad - plan.x_chunk) * 4)
        if not correctness_only:
            # real pod: measure per-chip bandwidth
            xm = x
            if plan.local_method == "pallas":
                run, arrs = plan._run_pallas, (plan._wr, plan._ob,
                                               plan._val, plan._lcol)
            elif plan.local_method == "pseg":
                run = plan._run_pseg
                arrs = (plan._pwr, plan._pob, plan._pval, plan._plcol,
                        plan._ptsb, plan._psrow, plan._pscol, plan._psval)
                xm = np.asarray(x)[plan._pseg_colperm]
            else:
                run, arrs = plan._run, (plan._col, plan._val)
            x_pad0 = jnp.zeros(plan.n_pad,
                               jnp.float32).at[:n].set(jnp.asarray(xm))
            x_pad0 = jax.device_put(x_pad0, plan._x_sharding)

            def step(xp, *rest):
                yv = run(*rest[:-1], xp)
                return rest[-1] + 1e-30 * jnp.pad(
                    yv, (0, plan.n_pad - n))[: plan.n_pad]

            per = measure_seconds_per_iter(step, x_pad0, *arrs, x_pad0,
                                           iters_lo=2, iters_hi=8, repeats=2)
            rec["seconds_per_iter"] = per
            rec["gbps_per_chip"] = plan.bytes_per_iter / nc / per / 1e9
        results.append(rec)
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    if len(results) > 1 and not correctness_only:
        base = results[0]
        for r in results[1:]:
            r["weak_efficiency"] = (r["gbps_per_chip"]
                                    / base["gbps_per_chip"])
        print("# weak efficiency:",
              {r["chips"]: round(r.get("weak_efficiency", 1.0), 3)
               for r in results}, flush=True)


if __name__ == "__main__":
    main()
