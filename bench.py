"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline (BASELINE.md north star): SpMV HBM bandwidth utilization on the
SuiteSparse 'cant' workload (emulated — no network), fp32 ELL stream, as a
percentage of STREAM-triad bandwidth measured on the same chip with the same
harness. vs_baseline is the ratio against the >=80%-of-STREAM target.
"""

import json
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from sblas import datasets
    from sblas.bench_lib import bench_spmv
    from sblas.utils.timing import stream_bandwidth

    a = datasets.emulate("cant", dtype=np.float32)
    rec = bench_spmv(a, method="auto", validate=True, iters=25)
    stream = rec.extra.get("stream_gbps") or stream_bandwidth()
    pct = 100.0 * rec.gbps / stream
    out = {
        "metric": "spmv_hbm_bw_utilization_cant_f32",
        "value": round(pct, 2),
        "unit": "% of measured STREAM-triad BW",
        "vs_baseline": round(pct / 80.0, 4),
        "detail": {
            "gbps": round(rec.gbps, 1),
            "stream_gbps": round(stream, 1),
            "gflops": round(rec.gflops, 1),
            "seconds_per_iter": rec.seconds_per_iter,
            "method": rec.extra.get("method"),
            "rel_err_vs_scipy": rec.extra.get("rel_err"),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
