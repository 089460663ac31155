"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline (BASELINE.md north star): SpMV HBM bandwidth utilization on the
SuiteSparse 'cant' workload (emulated — no network), fp32 w-SELL stream, as a
percentage of STREAM-triad bandwidth measured on the same chip with the same
harness. vs_baseline is the ratio against the >=80%-of-STREAM target.

Robustness (VERDICT r1 item 1b): the axon-tunneled TPU backend raises
transient UNAVAILABLE on init and can hang during remote compiles. The parent
process therefore runs the measurement in a child subprocess under a
stall watchdog, retries with backoff (persistent jax compilation cache makes
retries cheap), and ALWAYS emits a JSON line — on total failure the line
carries value 0 and the error tail so the driver records evidence instead of
rc!=0 with no output.
"""

import json
import os
import subprocess
import sys
import time

_CHILD_ENV = "SBLAS_BENCH_CHILD"


def child_main():
    import threading

    import jax
    import numpy as np

    # The persistent compile cache usually makes retries cheap — but one
    # observed tunnel failure mode (2026-08-19) hangs the FIRST computation
    # whenever the cache dir is set (remote executable serialization RPC
    # wedges) while cache-off compute still works. The parent therefore
    # turns the cache off from attempt 2 onward via this env var.
    if os.environ.get("SBLAS_COMPILE_CACHE", "1") != "0":
        jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sblas import datasets
    from sblas.bench_lib import bench_spmv
    from sblas.utils.timing import stream_bandwidth

    # Touch the backend FIRST. If the tunnel is dead this hangs producing no
    # output, and the parent's stall watchdog kills us quickly. Once devices
    # come up, a heartbeat thread keeps the watchdog fed through legitimately
    # slow remote compiles (only the per-attempt hard timeout applies then).
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr, flush=True)

    def beat():
        i = 0
        while True:
            time.sleep(20)
            i += 1
            print(f"[bench] heartbeat {i}", file=sys.stderr, flush=True)

    threading.Thread(target=beat, daemon=True).start()

    print("[bench] building matrix", file=sys.stderr, flush=True)
    a = datasets.emulate("cant", dtype=np.float32)
    print("[bench] running spmv bench", file=sys.stderr, flush=True)
    # interleaved ratio protocol: 5 back-to-back (kernel, STREAM) pairs,
    # median of per-pair ratios — same statistic on both sides, cancels the
    # ±3-7% chip-clock common mode (bench_lib.bench_spmv docstring)
    rec = bench_spmv(a, method="auto", validate=True, iters=25,
                     ratio_pairs=5)
    stream = rec.extra.get("stream_gbps") or stream_bandwidth()
    pct = rec.extra.get("pct_stream", 100.0 * rec.gbps / stream)
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
            "protocol": rec.extra.get("protocol"),
            "ratio_pairs": rec.extra.get("ratio_pairs"),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out), flush=True)
    return 0


def _run_attempt(timeout_s: float, stall_s: float, use_cache: bool = True):
    """Run the child; return (json_line_or_None, rc, tail). Kills on stall."""
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    env["SBLAS_COMPILE_CACHE"] = "1" if use_cache else "0"
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
    )
    start = time.time()
    # Read stderr in a thread so heartbeats reset the stall clock.
    import threading

    last_activity = [time.time()]
    err_tail = []

    def drain_err():
        for line in proc.stderr:
            last_activity[0] = time.time()
            err_tail.append(line.decode(errors="replace"))
            del err_tail[:-30]

    t = threading.Thread(target=drain_err, daemon=True)
    t.start()

    out_lines = []

    def drain_out():
        for line in proc.stdout:
            last_activity[0] = time.time()
            out_lines.append(line.decode(errors="replace"))

    t2 = threading.Thread(target=drain_out, daemon=True)
    t2.start()

    killed = None
    while proc.poll() is None:
        time.sleep(2)
        now = time.time()
        if now - start > timeout_s:
            killed = "timeout"
            proc.kill()
            break
        if now - last_activity[0] > stall_s:
            killed = "stall"
            proc.kill()
            break
    proc.wait()
    t.join(timeout=5)
    t2.join(timeout=5)
    json_line = None
    for line in reversed(out_lines):
        line = line.strip()
        if line.startswith("{"):
            try:
                json.loads(line)
                json_line = line
                break
            except ValueError:
                continue
    tail = "".join(err_tail[-12:])
    if killed:
        tail += f"\n[watchdog] killed child: {killed}"
    return json_line, proc.returncode, tail


def main():
    if os.environ.get(_CHILD_ENV):
        return child_main()

    # stall_s only fires while the child is silent (dead tunnel: no device
    # init, no heartbeat); a live child heartbeats every 20 s, so slow
    # compiles are bounded by timeout_s alone.
    # ALL attempts now run cache-off (round-11 flip): the cache-on attempt 1
    # was timeout-killed at 900 s while heartbeating in BOTH the r03 and r04
    # driver runs (BENCH_r0{3,4}.json tails), always under driver-boot
    # conditions (fresh /tmp, first-write serialization path), while the
    # same-session suites run cache-on without issue — see DESIGN.md
    # round-11. bench.py compiles ONE kernel (~30 s), so the cache saves
    # nothing worth a 15-minute first-attempt loss. Attempt 4 keeps cache-on
    # as a last-resort diversity fallback.
    attempts = [(900, 150, False), (900, 150, False), (600, 120, False),
                (420, 120, True)]
    last_tail = ""
    for i, (timeout_s, stall_s, use_cache) in enumerate(attempts):
        print(f"[bench] attempt {i + 1}/{len(attempts)} "
              f"cache={'on' if use_cache else 'off'}", file=sys.stderr,
              flush=True)
        json_line, rc, tail = _run_attempt(timeout_s, stall_s, use_cache)
        last_tail = tail
        if json_line is not None:
            print(json_line, flush=True)
            return 0
        print(f"[bench] attempt {i + 1} failed rc={rc}\n{tail}",
              file=sys.stderr, flush=True)
        time.sleep(min(15 * (i + 1), 45))

    # Total failure: still emit a machine-readable line.
    out = {
        "metric": "spmv_hbm_bw_utilization_cant_f32",
        "value": 0.0,
        "unit": "% of measured STREAM-triad BW",
        "vs_baseline": 0.0,
        "detail": {"error": "all attempts failed", "tail": last_tail[-2000:]},
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
