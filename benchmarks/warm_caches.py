"""Pre-warm the generated-matrix cache for the >=100M-nnz suite cases.

The matrix cache (sblas/plan_cache.py cached_matrix) does not persist
across build rounds (fresh machine each round), so the web-scale
generators — uk-2002-full alone paid 1254 s of gen in suite_r8 — must be
re-run cold once per round before `run_suite --large --web` can hit its
warm-path design point.  This script runs ONLY the host-side generators
(numpy + disk, no TPU) so it can be nice'd into the background while the
chip runs unrelated microbenchmarks.

Keys MUST match run_suite.run_large exactly: `suite-large-<case name>`.
"""
import os
import sys
import time
from pathlib import Path

# host-only job: never let the pre-imported jax grab the TPU tunnel
os.environ.setdefault("JAX_PLATFORMS", "cpu")
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from sblas import datasets  # noqa: E402
from sblas.plan_cache import cached_matrix  # noqa: E402

CASES = [
    # powerlaw first: e33b needs it soonest
    ("powerlaw-1M-102M", lambda: datasets.powerlaw_graph(
        1_000_000, avg_deg=120, seed=7, dtype=np.float32)),
    ("uk-2002-full", lambda: datasets.emulate(
        "uk-2002", scale=1.0, dtype=np.float32)),
    ("fem-band-1M-112M", lambda: datasets.random_csr(
        1_000_000, 1_000_000, 112, bandwidth=1500, seed=7,
        dtype=np.float32)),
    ("fem-cluster-1M-109M", lambda: datasets.random_csr(
        1_000_000, 1_000_000, 130, bandwidth=180, seed=11,
        dtype=np.float32)),
]


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, gen in CASES:
        if only and only not in name:
            continue
        t0 = time.time()
        a = cached_matrix(f"suite-large-{name}", gen)
        print(f"warm {name}: nnz={a.nnz} in {time.time() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
