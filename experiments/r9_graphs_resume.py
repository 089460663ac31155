"""Shim: resume the r9 suite's graph stage (run under run_with_retry.sh,
which only accepts an argv-less script). Appends to the interrupted
suite_1787159079.jsonl so the mid-size r9 suite becomes complete."""
import sys
from pathlib import Path

sys.argv = [
    "run_suite.py", "--graphs-only",
    "--out", str(Path(__file__).resolve().parent.parent /
                 "benchmarks/results/suite_1787159079.jsonl"),
]
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
import run_suite  # noqa: E402

run_suite.main()
