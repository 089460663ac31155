"""Bisect the w-SELL pallas kernel correctness on real TPU."""
import sys
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
sys.path.insert(0, "/root/repo")
from sblas import datasets
from sblas.formats import COO, coo_to_csr
from sblas.ops.kernels.spmv_pallas import PallasSpmv
from sblas.golden import spmv_golden, rel_err

P = lambda *a: print(*a, flush=True)
rng = np.random.default_rng(0)

def check(name, a, **kw):
    try:
        p = PallasSpmv(a, min_fill=0.0, **kw)
        x = rng.standard_normal(a.shape[1]).astype(np.float32)
        y = np.asarray(jax.jit(p.apply_pure)(p.device_arrays(), jnp.asarray(x)))
        ref = spmv_golden(a, x)
        err = rel_err(y, ref)
        w = p.layout
        P(f"{name}: err={err:.2e} sub={w.sub} tiles={w.num_tiles} "
          f"groups={w.num_groups} {'OK' if err < 2e-5 else 'WRONG'}")
        if err >= 2e-5:
            bad = np.flatnonzero(np.abs(y - ref) > 1e-4 * max(1, np.abs(ref).max()))
            P(f"   bad rows ({len(bad)}): {bad[:12]} of {a.shape[0]}")
        return err < 2e-5
    except Exception as e:
        P(f"{name}: EXC {str(e)[:200]}")
        return False

# A: 8 rows, one panel, sub=1
dense = np.zeros((8, 128)); dense[np.arange(8)[:, None], rng.integers(0, 128, (8, 5))] = 1.0
coo = COO((8, 128), *np.nonzero(dense), dense[np.nonzero(dense)].astype(np.float32))
check("A single tile sub=1", coo_to_csr(coo), sub=1, pmax=1)

# B: multi panel pmax=4, cols in [0, 512)
dense = np.zeros((8, 512)); dense[np.arange(8)[:, None], rng.integers(0, 512, (8, 9))] = 1.0
coo = COO((8, 512), *np.nonzero(dense), dense[np.nonzero(dense)].astype(np.float32))
check("B multi-panel sub=1", coo_to_csr(coo), sub=1, pmax=4)

# C: accumulation — rows with >128 nnz in one panel? no: rows 8, 300 nnz spread 512 -> multiple tiles/group
a = datasets.random_csr(8, 512, 200, seed=1, dtype=np.float32)
check("C multi-tile group sub=1", a, sub=1, pmax=2)

# D: window base far from 0
dense = np.zeros((8, 4096)); dense[np.arange(8)[:, None], 3000 + rng.integers(0, 128, (8, 6))] = 1.0
coo = COO((8, 4096), *np.nonzero(dense), dense[np.nonzero(dense)].astype(np.float32))
check("D offset window sub=1", coo_to_csr(coo), sub=1, pmax=1)

# E: sub=4 segmentation
a = datasets.random_csr(64, 256, 10, bandwidth=30, seed=2, dtype=np.float32)
check("E sub=4", a, sub=4, pmax=4)

# F: sub=16
a = datasets.banded(256, 3, seed=3, dtype=np.float32)
check("F sub=16 banded", a, sub=16, pmax=2)

# G: many groups
a = datasets.random_csr(1024, 1024, 20, bandwidth=80, seed=4, dtype=np.float32)
check("G 1024 rows auto", a)

# H: cant-scale
a = datasets.emulate("cant", scale=0.2, dtype=np.float32)
check("H cant scale=0.2 auto", a)
