"""Re-run the FEM SpMV rows under the interleaved ratio protocol.

The first r9 pass emitted single-sample rows (cant 79.9%, pdb1HYS 78.3%
median-of-5-wall-clock against a once-cached STREAM); this appends
ratio-median-of-5 rows (same statistic on numerator and denominator —
bench_lib.bench_spmv docstring; VERDICT r2 item 5a) to the same suite file.
Idempotent under the watchdog: rows that already carry the ratio protocol
are skipped.
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MID = ROOT / "benchmarks/results/suite_1787159079.jsonl"


def have_ratio(matrix):
    for line in MID.read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if (r.get("name") == "spmv" and r.get("matrix") == matrix
                and str(r.get("protocol", "")).startswith("ratio-")):
            return True
    return False


def main():
    import numpy as np

    from sblas import bench_lib, datasets

    for name in ("cant", "consph", "pdb1HYS", "pwtk"):
        if have_ratio(name):
            print(f"# skip {name} (ratio row present)", flush=True)
            continue
        a = datasets.emulate(name, scale=1.0, dtype=np.float32)
        rec = bench_lib.bench_spmv(a, method="auto", iters=25, ratio_pairs=5)
        rec.extra["matrix"] = name
        d = rec.as_dict()
        with open(MID, "a") as f:
            f.write(json.dumps(d) + "\n")
        print(json.dumps(d), flush=True)


if __name__ == "__main__":
    main()
