"""k-resident PSEG SpMM (one schedule pass serves all kc<=8 RHS).

Geometry is shrunk (kres_geo = (kc=8, bpg=2 blocks per y group, ch=16
panels per tail-Xt chunk), th=64) so a few-thousand-row matrix exercises
every boundary the full-size executor meets at m=1M: multiple y groups,
group transitions in both the hub and tail streams, chunk streaming,
empty groups, and pad tiles.  Reference: scipy dense product (golden.py
precedent).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import sblas.ops.kernels.spmm_pseg as spmm_pseg
from sblas.formats import CSR


# tiny geometry: kc=8 RHS resident, 2 blocks per y group, 16-panel tail
# chunks — a few-thousand-row matrix then exercises every boundary the
# full-size executor meets at web scale
GEO = (8, 2, 16)


def _powerlaw(rng, m, n, nnz, hub_frac=0.4, hub_cols=200):
    rows = rng.integers(0, m, nnz)
    cols = np.where(rng.random(nnz) < hub_frac,
                    rng.integers(0, min(hub_cols, n), nnz),
                    rng.integers(0, n, nnz))
    vals = rng.standard_normal(nnz).astype(np.float32)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    a.sum_duplicates()
    return a


def _check(ex, a_sp, k, rng, tol=2e-5):
    import jax.numpy as jnp

    x = rng.standard_normal((a_sp.shape[1], k)).astype(np.float32)
    y = np.asarray(ex.apply_pure(ex.device_arrays(), jnp.asarray(x)))
    ref = a_sp @ x
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30)
    assert err < tol, err


def test_kres_groups_and_chunks():
    rng = np.random.default_rng(0)
    a_sp = _powerlaw(rng, 5000, 10000, 30000)
    ex = spmm_pseg.PallasSpmmScattered(
        CSR.from_scipy(a_sp), hybrid=True, k_hint=8, th=64, kres=True, kres_geo=GEO)
    assert ex._kres
    assert ex._kres_geo[0] > 1          # multiple y groups
    assert ex._kranges[0][1]["ck"].max() > 0   # multiple tail-Xt chunks
    _check(ex, a_sp, 8, rng)


def test_kres_multi_range(monkeypatch):
    # tiny SMEM cap -> the group sequence splits over several call pairs
    monkeypatch.setattr(spmm_pseg, "_SMEM_ROUND_CAP", 128)
    rng = np.random.default_rng(5)
    a_sp = _powerlaw(rng, 5000, 10000, 30000)
    ex = spmm_pseg.PallasSpmmScattered(
        CSR.from_scipy(a_sp), hybrid=True, k_hint=8, th=64, kres=True, kres_geo=GEO)
    assert ex._kres and len(ex._kranges) > 1
    # all ranges share one compiled shape per stream
    hts = {r[2] for r in ex._kranges}
    tts = {r[3] for r in ex._kranges}
    assert len(hts) == 1 and len(tts) == 1
    _check(ex, a_sp, 8, rng)


@pytest.mark.parametrize("k", [1, 3, 13])
def test_kres_odd_k(k):
    rng = np.random.default_rng(1)
    a_sp = _powerlaw(rng, 3000, 6000, 15000)
    ex = spmm_pseg.PallasSpmmScattered(
        CSR.from_scipy(a_sp), hybrid=True, k_hint=8, th=64, kres=True, kres_geo=GEO)
    assert ex._kres
    _check(ex, a_sp, k, rng)


def test_kres_empty_groups():
    # all rows in blocks 0 and 4 -> groups 1 (blocks 2-3) emit pad tiles
    rng = np.random.default_rng(2)
    nnz = 8000
    rows = np.where(rng.random(nnz) < 0.5,
                    rng.integers(0, 1024, nnz),
                    rng.integers(4096, 5000, nnz))
    cols = rng.integers(0, 6000, nnz)
    vals = rng.standard_normal(nnz).astype(np.float32)
    a_sp = sp.coo_matrix((vals, (rows, cols)), shape=(5000, 6000)).tocsr()
    a_sp.sum_duplicates()
    ex = spmm_pseg.PallasSpmmScattered(
        CSR.from_scipy(a_sp), hybrid=True, k_hint=8, th=64, reorder=False, kres=True, kres_geo=GEO)
    assert ex._kres
    _check(ex, a_sp, 8, rng)


def test_kres_hub_only():
    # every column inside the hub panels -> tail stream is all pad tiles
    rng = np.random.default_rng(3)
    a_sp = _powerlaw(rng, 3000, 250, 10000, hub_frac=1.0, hub_cols=250)
    ex = spmm_pseg.PallasSpmmScattered(
        CSR.from_scipy(a_sp), hybrid=True, k_hint=8, th=64, reorder=False, kres=True, kres_geo=GEO)
    assert ex._kres
    _check(ex, a_sp, 8, rng)


def test_kres_no_hub_rounds():
    # every column past the hub panels (reorder off) -> the hub stream is
    # nothing but empty-group pad tiles
    rng = np.random.default_rng(8)
    nnz = 8000
    rows = rng.integers(0, 3000, nnz)
    cols = rng.integers(256, 6000, nnz)
    vals = rng.standard_normal(nnz).astype(np.float32)
    a_sp = sp.coo_matrix((vals, (rows, cols)), shape=(3000, 6000)).tocsr()
    a_sp.sum_duplicates()
    ex = spmm_pseg.PallasSpmmScattered(
        CSR.from_scipy(a_sp), hybrid=True, k_hint=8, th=64, reorder=False,
        kres=True, kres_geo=GEO)
    assert ex._kres
    _check(ex, a_sp, 8, rng)


def test_kres_tiny_m():
    # single 1024-row block -> one y group, hub+tail still split
    rng = np.random.default_rng(9)
    a_sp = _powerlaw(rng, 500, 4000, 4000)
    ex = spmm_pseg.PallasSpmmScattered(
        CSR.from_scipy(a_sp), hybrid=True, k_hint=8, th=64, kres=True,
        kres_geo=GEO)
    assert ex._kres
    _check(ex, a_sp, 8, rng)


def test_spmv_big_wrapper():
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    a_sp = _powerlaw(rng, 5000, 5000, 25000)
    from sblas.ops.kernels.spmv_pseg import PallasSpmvScatteredBig

    ex = PallasSpmvScatteredBig(CSR.from_scipy(a_sp))
    x = rng.standard_normal(5000).astype(np.float32)
    y = np.asarray(ex.apply_pure(ex.device_arrays(), jnp.asarray(x)))
    ref = a_sp @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5


def test_spmv_plan_pseg_big():
    # the pseg_big plan method keeps the pseg permuted-space interface
    # (bench drives apply_permuted through plan.method == "pseg")
    from sblas.ops.spmv import SpmvPlan

    rng = np.random.default_rng(7)
    a_sp = _powerlaw(rng, 5000, 5000, 25000)
    plan = SpmvPlan(CSR.from_scipy(a_sp), "pseg_big")
    assert plan.method == "pseg"
    assert getattr(plan._pallas, "_kres", False)
    x = rng.standard_normal(5000).astype(np.float32)
    y = np.asarray(plan(x))
    ref = a_sp @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5
    import jax.numpy as jnp

    arrs = plan.device_arrays()
    xp = jnp.asarray(x)[jnp.asarray(plan._pallas.colperm)]
    yp = np.asarray(plan.apply_permuted(arrs, xp))
    y_nat = yp[np.asarray(arrs["rowinv"])]
    assert np.abs(y_nat - ref).max() / np.abs(ref).max() < 2e-5


def test_kres_matches_standard_path():
    rng = np.random.default_rng(4)
    a_sp = _powerlaw(rng, 4000, 8000, 20000)
    a = CSR.from_scipy(a_sp)
    import jax.numpy as jnp

    x = rng.standard_normal((8000, 8)).astype(np.float32)
    ex_k = spmm_pseg.PallasSpmmScattered(a, hybrid=True, k_hint=8, th=64, kres=True, kres_geo=GEO)
    ex_s = spmm_pseg.PallasSpmmScattered(a, hybrid=True, th=64, kres=False)
    assert ex_k._kres and not ex_s._kres
    yk = np.asarray(ex_k.apply_pure(ex_k.device_arrays(), jnp.asarray(x)))
    ys = np.asarray(ex_s.apply_pure(ex_s.device_arrays(), jnp.asarray(x)))
    ref = a_sp @ x
    scale = np.abs(ref).max()
    assert np.abs(yk - ref).max() / scale < 2e-5
    assert np.abs(yk - ys).max() / scale < 2e-5


def test_kres_bundle_cache_roundtrip(tmp_path, monkeypatch):
    # round-11 persistent kres-plan cache: a bundle-restored plan must be
    # byte-identical to the uncached build (host-side equivalence; kernel
    # execution itself is covered by the other kres tests). Backend forced
    # to 'tpu' so the not-on_cpu gate opens; nothing touches a device
    # kernel (construction + device_arrays only).
    import numpy as np

    import sblas.ops.kernels.spmm_pseg as sp
    import sblas.plan_cache as pc
    import sblas.utils.backend as be
    from sblas import datasets

    # big enough that kc_whole < 8 (per_k > 1.5 MB needs m + n > ~393K)
    g = datasets.emulate("uk-2002", scale=0.012, dtype=np.float32)
    saved = be._BACKEND
    be._BACKEND = "tpu"
    monkeypatch.setattr(sp, "_KRES_CACHE_MIN_NNZ", 1)
    monkeypatch.setattr(pc, "_DEFAULT_DIR", str(tmp_path))
    try:
        # reference: uncached build (cache disabled via env)
        monkeypatch.setenv("SBLAS_NO_CACHE", "1")
        p0 = sp.PallasSpmmScattered(g, k_hint=8, kres=None)
        assert p0._kres, "test matrix must auto-pick kres"
        monkeypatch.delenv("SBLAS_NO_CACHE")
        # cold build through the bundle path (miss -> build -> store)
        p1 = sp.PallasSpmmScattered(g, k_hint=8, kres=None)
        assert any(e.name.startswith("psegk-") for e in tmp_path.iterdir())
        # warm restore (hit -> mmap)
        p2 = sp.PallasSpmmScattered(g, k_hint=8, kres=None)
    finally:
        be._BACKEND = saved
    for p in (p1, p2):
        assert p._kres
        assert p._kc == p0._kc and p._ch == p0._ch
        assert p._kres_geo == p0._kres_geo
        assert p.bytes_per_iter == p0.bytes_per_iter
        assert p.layout.fill == pytest.approx(p0.layout.fill)
        assert p.layout.n_stragglers == p0.layout.n_stragglers
        assert len(p._kranges) == len(p0._kranges)
        for (h, t, ht, tt, g0, g1), (h0, t0, ht0, tt0, g00, g10) in zip(
                p._kranges, p0._kranges):
            assert (ht, tt, g0, g1) == (ht0, tt0, g00, g10)
            for kk in h0:
                assert np.array_equal(np.asarray(h[kk]), np.asarray(h0[kk]))
            for kk in t0:
                assert np.array_equal(np.asarray(t[kk]), np.asarray(t0[kk]))
        assert np.array_equal(p.colperm, p0.colperm)
        assert np.array_equal(np.asarray(p._rowperm_inv),
                              np.asarray(p0._rowperm_inv))
