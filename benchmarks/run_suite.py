"""Full benchmark suite (SURVEY.md C14; BASELINE.json configs #1-#4).

Runs on the real TPU chip; writes one JSON line per benchmark to
benchmarks/results/suite_<timestamp>.jsonl and prints a summary table.

Usage: python benchmarks/run_suite.py [--quick]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

import jax
import numpy as np

# SBLAS_COMPILE_CACHE=0 disables the persistent compile cache: one observed
# axon failure mode (2026-08-19) wedges every cache-enabled client on its
# first computation while cache-off compute works (see bench.py).
if os.environ.get("SBLAS_COMPILE_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# fp64 records need jax_enable_x64 (without it jax silently downcasts
# float64 to f32 — caught round 5: f64 SpMV "validated" at 1e-7). But the
# flag is global and poisons every int index array to int64, which Mosaic
# rejects — so the f64 stage runs in a SUBPROCESS (--f64-only) with the
# flag on, and the parent process never sets it. The config.update here is
# belt-and-braces: the sitecustomize pre-imports jax, and one suite_r5
# attempt saw the late update NOT stick (f64 arrays downcast, validation
# tripped at 1e-7) — the subprocess launch therefore also sets
# JAX_ENABLE_X64=1 in its environment, which jax reads at import.
if "--f64-only" in sys.argv:
    jax.config.update("jax_enable_x64", True)
    assert jax.config.jax_enable_x64, "x64 flag did not stick"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sblas import datasets
from sblas import bench_lib
from sblas.utils.timing import stream_bandwidth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--large", action="store_true",
                    help="only the >=100M-nnz single-chip records "
                         "(VERDICT r1 item 4)")
    ap.add_argument("--web", action="store_true",
                    help="with --large: add the FULL-scale uk-2002 "
                         "emulation (18.5M rows, 298M nnz; ~1h gen+pack "
                         "cold)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--case", default=None,
                    help="with --large: run only cases whose name contains "
                         "this substring")
    ap.add_argument("--f64-only", action="store_true",
                    help="run just the fp64 record (x64 flag on; used as a "
                         "subprocess by the main suite)")
    ap.add_argument("--graphs-only", action="store_true",
                    help="run just the power-law graph stage (resume an "
                         "interrupted suite with --out <same file>)")
    ap.add_argument("--spmm-only", action="store_true",
                    help="run one large-case SpMM record in THIS process "
                         "(used as a subprocess by run_large: at web scale "
                         "the bench only fits HBM in a fresh process)")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    out = Path(args.out or Path(__file__).parent / "results" /
               f"suite_{int(time.time())}.jsonl")
    out.parent.mkdir(parents=True, exist_ok=True)
    records = []

    def emit(rec):
        d = rec.as_dict()
        records.append(d)
        with open(out, "a") as f:
            f.write(json.dumps(d) + "\n")
        print(json.dumps(d), flush=True)

    if args.f64_only:
        a64 = datasets.emulate("cant", scale=1.0, dtype=np.float64)
        rec = bench_lib.bench_spmv(a64, method="auto", iters=3)
        rec.extra["matrix"] = "cant-f64"
        emit(rec)
        return

    if args.spmm_only:
        from sblas.plan_cache import cached_matrix

        name, gen = next((n, g) for n, g in _large_cases(web=True)
                         if args.case and args.case in n)
        a = cached_matrix(f"suite-large-{name}", gen)
        rec = bench_lib.bench_spmm(a, args.k, method="auto", iters=4,
                                   ratio_pairs=3)
        rec.extra["matrix"] = name
        emit(rec)
        return

    sbw = stream_bandwidth()
    print(f"# STREAM {sbw:.1f} GB/s on {jax.devices()[0]}", flush=True)

    if args.graphs_only:
        run_graphs(emit)
        print(f"# wrote {len(records)} records to {out}", flush=True)
        return

    if args.large:
        run_large(emit, web=args.web, only=args.case, out_path=out)
        print(f"# wrote {len(records)} records to {out}", flush=True)
        return

    fem = ["cant", "consph", "pdb1HYS", "pwtk"] if not args.quick \
        else ["cant"]
    scale = 1.0

    # Config #1: SpMV over the FEM suite, f32 fast path + f64 correctness.
    # All rows use the interleaved ratio protocol: same-code repeat wobble
    # is ±3-7% (e27) and cant/pdb1HYS straddle the 80%-of-STREAM bar, so a
    # lone kernel sample against a process-cached STREAM proves nothing
    # either way (VERDICT r2 item 5a; bench_lib.bench_spmv docstring).
    #
    # consph: per-matrix w-SELL geometry from the e35 sweep — wgroup=2
    # halves the window-group padding on its heavy rows (fill 0.521 ->
    # 0.578) AND cuts wall time 115.5 -> 103.5 us; 9 ratio pairs because
    # consph's identical-config medians wobble +-1.7 pts around the 80%
    # bar (e35 measured the same auto config at 79.4 and 82.7).
    # pdb1HYS gets the same 9-pair replication: its r9 median was 80.2 with
    # 2 of 5 pairs below 80 — a coin flip the wider sample settles either
    # way (VERDICT r4 weak #6).
    fem_geometry = {"consph": {"sub": 16, "wgroup": 2}}
    fem_pairs = {"consph": 9, "pdb1HYS": 9}
    for name in fem:
        a = datasets.emulate(name, scale=scale, dtype=np.float32)
        rec = bench_lib.bench_spmv(a, method="auto", iters=25,
                                   ratio_pairs=fem_pairs.get(name, 5),
                                   geometry=fem_geometry.get(name))
        rec.extra["matrix"] = name
        emit(rec)

    # bf16 value stream on the flagship matrix (half the nnz stream)
    if not args.quick:
        try:
            a = datasets.emulate("cant", scale=scale, dtype=np.float32)
            rec = bench_lib.bench_spmv(a, method="auto", iters=25,
                                       value_dtype="bfloat16")
            rec.extra["matrix"] = "cant"
            emit(rec)
        except Exception as e:
            print(f"# spmv bf16 FAIL: {str(e)[:200]}", flush=True)

    # fp64: BASELINE.md requires fp64 runs to report their own BW alongside
    # correctness (XLA path — Mosaic has no f64; VERDICT r1 item 8).
    # Subprocess: jax_enable_x64 is process-global and would poison the f32
    # paths' index dtypes (see header comment).
    if not args.quick:
        import os
        import subprocess

        r = subprocess.run(
            [sys.executable, __file__, "--f64-only", "--out", str(out)],
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, "JAX_ENABLE_X64": "1"})
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                records.append(json.loads(line))
                print(line, flush=True)
        if r.returncode != 0:
            print(f"# spmv f64 FAIL: {r.stderr[-300:]}", flush=True)

        # double-single Pallas fast path: f64-class accuracy (~1e-14) from
        # two f32 planes (spmv_wsell_ds; VERDICT r1 item 8's "first TPU
        # f64-class fast path"). Runs in THIS process (x64 off): the ds
        # design keeps jax x64-free (host-numpy split/merge carries the
        # precision), and under JAX_ENABLE_X64 Mosaic rejects the kernel
        # ("64-bit types are not supported") — which is why earlier suites
        # silently lost this record inside the f64 subprocess.
        try:
            a64 = datasets.emulate("cant", scale=1.0, dtype=np.float64)
            rec = bench_lib.bench_spmv(a64, method="pallas_ds", iters=25)
            rec.extra["matrix"] = "cant-f64"
            emit(rec)
        except Exception as e:
            print(f"# spmv f64 ds FAIL: {str(e)[:300]}", flush=True)

        # f64-class ds rows for the OTHER two routines (VERDICT r2 item 4:
        # every routine's fp64 runs must report their own BW): SpMM = k ds
        # SpMV passes; SpTRSV = f32 wavefront + ds residual refinement
        try:
            rec = bench_lib.bench_spmm(a64, 8, method="pallas_ds", iters=8)
            rec.extra["matrix"] = "cant-f64"
            emit(rec)
        except Exception as e:
            print(f"# spmm f64 ds FAIL: {str(e)[:300]}", flush=True)
        try:
            l64 = datasets.lower_triangular(
                62451, 30, bandwidth=4000, seed=1, dtype=np.float64)
            rec = bench_lib.bench_sptrsv(l64, iters=8, method="pallas_ds")
            rec.extra["matrix"] = "band-parallel-f64"
            emit(rec)
        except Exception as e:
            print(f"# sptrsv f64 ds FAIL: {str(e)[:300]}", flush=True)
        try:
            spd60_64 = datasets.poisson2d_nd(60, dtype=np.float64)
            l60 = datasets.cholesky_factor(spd60_64, dtype=np.float64)
            rec = bench_lib.bench_sptrsv(l60, iters=8, method="pallas_ds")
            rec.extra["matrix"] = "chol-nd-poisson2d-60-f64"
            emit(rec)
        except Exception as e:
            print(f"# sptrsv chol f64 ds FAIL: {str(e)[:300]}", flush=True)
        # f64-class SpTRSM (VERDICT r3 item 5): lanes wavefront shares one
        # schedule pass across 8 RHS, ds refinement in slot space
        try:
            rec = bench_lib.bench_sptrsm(l64, 8, iters=8,
                                         method="pallas_ds")
            rec.extra["matrix"] = "band-parallel-f64"
            emit(rec)
        except Exception as e:
            print(f"# sptrsm f64 ds FAIL: {str(e)[:300]}", flush=True)

    # Config #2: SpMM K=8/32 over the full FEM set (every README row must
    # have a committed record; VERDICT r1 item 1)
    for name in fem:
        a = datasets.emulate(name, scale=scale, dtype=np.float32)
        for k in (8, 32):
            try:
                rec = bench_lib.bench_spmm(a, k, method="auto", iters=10)
                rec.extra["matrix"] = name
                emit(rec)
            except Exception as e:
                print(f"# spmm {name} k={k} FAIL: {str(e)[:200]}", flush=True)

    # Config #3: SpTRSV on a Cholesky-like factor + parallel band.
    # compare_reference only on cases whose jnp-loop reference executes in
    # seconds: one reference application is O(nlevels * ell_width * n) of
    # serial TPU gathers, and a single multi-minute device program gets the
    # axon worker killed server-side (observed: chol-nd-120 with reference
    # crashed the worker twice; without it, runs in 0.55 ms).
    tri_cases = [
        ("band-parallel", datasets.lower_triangular(
            62451, 30, bandwidth=4000, seed=1, dtype=np.float32), True),
    ]
    if not args.quick:
        # nested-dissection ordered: the realistic fill-reducing regime
        # (natural-order banded factors are fully serial, see datasets)
        spd = datasets.poisson2d_nd(120, dtype=np.float64)
        tri_cases.append(
            ("chol-nd-poisson2d-120",
             datasets.cholesky_factor(spd, dtype=np.float32), False))
        spd60 = datasets.poisson2d_nd(60, dtype=np.float64)
        tri_cases.append(
            ("chol-nd-poisson2d-60",
             datasets.cholesky_factor(spd60, dtype=np.float32), True))
    for name, l, ref in tri_cases:
        try:
            rec = bench_lib.bench_sptrsv(
                l, iters=10, compare_reference=ref and not args.quick)
            rec.extra["matrix"] = name
            emit(rec)
        except Exception as e:
            print(f"# sptrsv {name} FAIL: {str(e)[:200]}", flush=True)

    # SpTRSM: K RHS over the same factors (analysis shared with SpTRSV)
    for name, l, _ref in tri_cases:
        if args.quick:
            break
        try:
            rec = bench_lib.bench_sptrsm(l, 8, iters=8)
            rec.extra["matrix"] = name
            emit(rec)
        except Exception as e:
            print(f"# sptrsm {name} FAIL: {str(e)[:200]}", flush=True)

    if not args.quick:
        run_graphs(emit)

    # Multi-chip (only meaningful on a real pod slice; the 1-chip axon
    # tunnel never takes this branch)
    if jax.device_count() > 1 and not args.quick:
        try:
            from sblas.parallel import make_mesh

            a = datasets.emulate("cant", scale=scale, dtype=np.float32)
            rec = bench_lib.bench_dist_spmv(a, make_mesh(), iters=10)
            rec.extra["matrix"] = "cant"
            emit(rec)
        except Exception as e:
            print(f"# dist-spmv FAIL: {str(e)[:200]}", flush=True)

    print(f"# wrote {len(records)} records to {out}", flush=True)


def run_graphs(emit):
    """Config #5 regime: scattered power-law graphs (PSEG fast path).

    Scales sized so nnz is in the millions — the @0.01/@0.004 round-3
    runs were fixed-overhead-bound (65 us for 6 MB of traffic). Factored
    out so an interrupted suite can resume just this stage
    (``--graphs-only --out <same file>``).
    """
    for name, scale in (("uk-2002", 0.05), ("twitter7", 0.02)):
        try:
            g = datasets.emulate(name, scale=scale, dtype=np.float32)
            rec = bench_lib.bench_spmv(g, method="auto", iters=15,
                                       ratio_pairs=5)
            rec.extra["matrix"] = f"{name}@{scale}"
            emit(rec)
        except Exception as e:
            print(f"# graph spmv {name} FAIL: {str(e)[:200]}", flush=True)
            continue
        # graph SpMM k=8 (k-resident PSEG: one schedule pass for all 8 RHS)
        # and k=32 (4 chunked kres passes; BASELINE config #2 names K=32 —
        # VERDICT r2 item 7)
        for kk in (8, 32):
            try:
                rec = bench_lib.bench_spmm(g, kk, method="auto", iters=8,
                                           ratio_pairs=3)
                rec.extra["matrix"] = f"{name}@{scale}"
                emit(rec)
            except Exception as e:
                print(f"# graph spmm {name} k={kk} FAIL: {str(e)[:200]}",
                      flush=True)


def _large_cases(web: bool = False):
    """(name, generator) table for the >=100M-nnz cases — shared by
    run_large and the --spmm-only subprocess entry."""
    cases = [
        # FEM-style band locality: ~8.5 nnz per 2-panel window keeps
        # w-SELL fill healthy at deg 112 (112e6 nnz: the round-5 deg-100
        # cases landed at 98.3M/84.7M, just UNDER the >=1e8 criterion of
        # VERDICT r1 item 4)
        ("fem-band-1M-112M", lambda: datasets.random_csr(
            1_000_000, 1_000_000, 112, bandwidth=1500, seed=7,
            dtype=np.float32)),
        # power-law hub structure at the same scale (PSEG path); avg_deg
        # 120 nets ~102M after dedup
        ("powerlaw-1M-102M", lambda: datasets.powerlaw_graph(
            1_000_000, avg_deg=120, seed=7, dtype=np.float32)),
        # real-FEM-like clustering (the small-suite emulations use bw ~
        # 2.5x deg, giving 128x128 panel density 0.10-0.17): bsr_pallas_t
        # streamed-Xt SpMM applies at this scale, vs the bw=1500 case
        # above whose 0.035 panel density forces the gather-bound paths
        ("fem-cluster-1M-109M", lambda: datasets.random_csr(
            1_000_000, 1_000_000, 130, bandwidth=180, seed=11,
            dtype=np.float32)),
    ]
    if web:
        # FULL-scale uk-2002 emulation: 18.5M rows — x2d/y2d are 74 MB
        # each, far past the whole-VMEM executors, so SpMV routes through
        # pseg_big (y-grouped, chunk-streamed; spmv_pseg round 6) and SpMM
        # through spmv_passes (the kh=8 kres plan fails the HBM guard)
        cases.append(("uk-2002-full", lambda: datasets.emulate(
            "uk-2002", scale=1.0, dtype=np.float32)))
    return cases


def run_large(emit, web: bool = False, only: str | None = None,
              out_path=None):
    """>=100M-nnz single-chip records (VERDICT r1 item 4; SURVEY.md §7 hard
    parts 1 & 4).

    The single-chip kernels stage the whole x AND y in VMEM, so with the
    ~14 MB compile ceiling the row count caps near 1M f32 rows (x 4MB +
    y 4MB + double-buffered schedule tiles); the large cases therefore raise
    nnz through degree: 1M rows x deg 100. Records include generator and
    packer wall-times and the plan-cache warm-hit time (SURVEY.md §5
    checkpoint analogue).
    """
    import time as _t

    from sblas.ops.spmv import SpmvPlan
    from sblas.plan_cache import cached_matrix

    for name, gen in _large_cases(web=web):
        if only and only not in name:
            continue
        try:
            # generated matrices persist across runs (VERDICT r2 item 3:
            # at web scale the generator is the dominant un-cached cost —
            # uk-2002-full paid 1254 s of gen per suite_r8 run). The key
            # doubles as the layout cache's matrix digest, so warm packs
            # skip content hashing too.
            t0 = _t.time()
            a = cached_matrix(f"suite-large-{name}", gen)
            gen_s = _t.time() - t0
            # cold pack (plan-cache miss) vs warm rebuild (cache hit)
            t0 = _t.time()
            SpmvPlan(a, "auto")
            cold = _t.time() - t0
            t0 = _t.time()
            SpmvPlan(a, "auto")
            warm = _t.time() - t0
            # large rows carry ratio_pairs too (VERDICT r3 item 8): the
            # runs are minutes long, so clock drift between the kernel
            # sample and a process-cached STREAM is at its worst here
            rec = bench_lib.bench_spmv(a, method="auto", iters=10,
                                       ratio_pairs=5)
            rec.extra.update(matrix=name, gen_seconds=round(gen_s, 2),
                             pack_seconds_cold=round(cold, 2),
                             pack_seconds_warm=round(warm, 2))
            emit(rec)
        except Exception as e:
            print(f"# large spmv {name} FAIL: {str(e)[:300]}", flush=True)
            continue
        # k=8 AND k=32 (BASELINE config #2 names both; k=32 is where the
        # k-aware dense routing wins 4.25x over passes — e30)
        for kk in (8, 32):
            # release the previous bench's HBM: plans stay alive through
            # jax's jit cache (the cached step closure holds the executor's
            # device arrays), so clear it and collect
            import gc as _gc

            jax.clear_caches()
            _gc.collect()
            if a.nnz > 150_000_000:
                # at web scale even a cleaned process fragments: the
                # 7.4 GB passes plan + the fori measurement executable's
                # working set OOM'd after an in-process spmv bench twice
                # (gc+clear included) while the identical bench fits a
                # FRESH process — same precedent as the f64 subprocess
                import subprocess as _sp

                r = _sp.run(
                    [sys.executable, __file__, "--spmm-only", "--case",
                     name, "--k", str(kk), "--out", str(out_path)],
                    capture_output=True, text=True, timeout=7200)
                got = False
                for line in r.stdout.splitlines():
                    if line.startswith("{"):
                        print(line, flush=True)
                        got = True
                if not got:
                    print(f"# large spmm {name} k={kk} SUBPROC FAIL "
                          f"rc={r.returncode}: {r.stderr[-300:]}",
                          flush=True)
                continue
            try:
                rec = bench_lib.bench_spmm(a, kk, method="auto", iters=4,
                                           ratio_pairs=3)
                rec.extra["matrix"] = name
                emit(rec)
            except Exception as e:
                print(f"# large spmm {name} k={kk} FAIL: {str(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    main()
