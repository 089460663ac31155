"""e31: attack the SpTRSV round COUNT via within-level reordering
(VERDICT r2 item 8).

e24/e25/e26 measured the per-round cost shut (gather chain at issue rate,
dynamic gating loses, split3 adopted); the un-pulled lever is the round
count itself: the band factor spends 2128 rounds x ~349 ns because
level-set + 128-row-block packing yields that count. Rounds per block =
(greedy window sweep over the block's rows' dependency-slot panels), so
which rows SHARE a block decides how many windows the block must sweep.

Any within-level permutation preserves the level topology (deps stay in
strictly earlier levels), so the within-level sort key is free scheduling
freedom. Candidates counted host-side here (native packer, win=32):

  baseline   stable by original row index (the shipped default)
  mcol       mean original dependency column per row
  mincol     min dependency column
  mslot      mean dependency SLOT under the baseline layout (one
             fixed-point iteration: keys computed from the baseline
             slot_of_row, then the layout is rebuilt)

Rounds translate to time at the measured ~341-349 ns/round frontier; any
key that cuts >=10% gets an on-chip confirmation run (part 2, --chip).
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sblas import datasets  # noqa: E402
from sblas.ops.kernels import sptrsv_pallas as sp  # noqa: E402

OUT = Path(__file__).parent / "e31_results.jsonl"


def emit(d):
    with open(OUT, "a") as f:
        f.write(json.dumps(d) + "\n")
    print(json.dumps(d), flush=True)


def dep_stats(l):
    """Per-row off-diagonal dependency column stats (host, numpy)."""
    n = l.shape[0]
    rows = l.row_ids().astype(np.int64)
    cols = l.indices.astype(np.int64)
    off = cols < rows
    r, c = rows[off], cols[off]
    cnt = np.bincount(r, minlength=n).astype(np.float64)
    ssum = np.bincount(r, weights=c, minlength=n)
    mean = np.where(cnt > 0, ssum / np.maximum(cnt, 1), np.arange(n))
    mn = np.arange(n, dtype=np.float64).copy()
    np.minimum.at(mn, r, c.astype(np.float64))
    return mean, mn, r, c, cnt


def count_rounds(l, order_key, nwin=32):
    lay = sp._build_layout_impl(l, th=128, nwin=nwin, order_key=order_key)
    real = int((np.asarray(lay.round_oblk) < lay.num_blocks).sum())
    return real, lay


def main():
    import os

    os.environ["SBLAS_NO_CACHE"] = "1"   # keys must not hit cached layouts
    chip = "--chip" in sys.argv
    cases = [
        ("band-parallel", datasets.lower_triangular(
            62451, 30, bandwidth=4000, seed=1, dtype=np.float32)),
        ("chol-nd-poisson2d-120", datasets.cholesky_factor(
            datasets.poisson2d_nd(120, dtype=np.float64), dtype=np.float32)),
    ]
    for name, l in cases:
        mean, mn, r, c, cnt = dep_stats(l)
        keys = {
            "baseline": None,
            "mcol": mean.astype(np.int64),
            "mincol": mn.astype(np.int64),
        }
        results = {}
        base_lay = None
        for kname, key in keys.items():
            rounds, lay = count_rounds(l, key)
            results[kname] = rounds
            if kname == "baseline":
                base_lay = lay
            emit({"case": name, "key": kname, "rounds": rounds,
                  "blocks": int(lay.num_blocks), "nlevels": int(lay.nlevels)})
        # mslot: mean dep slot under the BASELINE layout (fixed-point step)
        slot = np.asarray(base_lay.slot_of_row, dtype=np.int64)
        n = l.shape[0]
        ssum = np.bincount(r, weights=slot[c].astype(np.float64),
                           minlength=n)
        mslot = np.where(cnt > 0, ssum / np.maximum(cnt, 1), slot[:n])
        rounds, lay_ms = count_rounds(l, mslot.astype(np.int64))
        results["mslot"] = rounds
        emit({"case": name, "key": "mslot", "rounds": rounds})

        best = min(results, key=results.get)
        emit({"case": name, "best": best, "rounds": results[best],
              "vs_baseline": round(results[best] / results["baseline"], 4)})

        if chip and results[best] < 0.95 * results["baseline"]:
            # on-chip confirmation at the measured frontier
            import jax.numpy as jnp
            from sblas.utils.timing import measure_seconds_per_iter

            for kname in ("baseline", best):
                key = (None if kname == "baseline"
                       else keys.get(kname, mslot.astype(np.int64)))
                lay = sp._build_layout_impl(l, th=128, nwin=32,
                                            order_key=key)
                p = sp.PallasSptrsv.__new__(sp.PallasSptrsv)
                # minimal init mirror: reuse the class's machinery by
                # building through a fresh object is complex; instead time
                # through the public plan with a monkeypatched key
                del p
                import sblas.ops.kernels.sptrsv_pallas as spp
                orig = spp._build_layout_impl

                def patched(ll, **kw):
                    kw["order_key"] = key
                    return orig(ll, **kw)

                spp._build_layout_impl = patched
                try:
                    tr = spp.PallasSptrsv(l, lower=True)
                finally:
                    spp._build_layout_impl = orig
                arrs = tr.device_arrays()
                rng = np.random.default_rng(0)
                b2d0 = jnp.asarray(tr.b_to_b2d(
                    rng.standard_normal(l.shape[0]).astype(np.float32)))

                def step(carry, arrs, b2d0):
                    x2d = tr.solve_permuted(arrs, b2d0 + carry * 1e-30)
                    return jnp.float32(1e-30) * x2d[0, 0]

                per = measure_seconds_per_iter(
                    step, jnp.float32(0.0), arrs, b2d0,
                    iters_lo=4, iters_hi=15)
                emit({"case": name, "chip_key": kname, "us": per * 1e6,
                      "rounds": int((np.asarray(tr.layout.round_oblk)
                                     < tr.layout.num_blocks).sum())})


if __name__ == "__main__":
    main()
