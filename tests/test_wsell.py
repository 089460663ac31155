import numpy as np
import pytest

from sblas import datasets
from sblas.retile_wsell import pack_wsell, wsell_to_dense
from sblas.golden import spmv_golden, rel_err


@pytest.mark.parametrize("gen", ["banded", "fem", "random_narrow"])
def test_pack_roundtrip(gen):
    if gen == "banded":
        a = datasets.banded(100, 5, seed=1)
    elif gen == "fem":
        a = datasets.random_csr(200, 200, 12, bandwidth=40, seed=2)
    else:
        a = datasets.random_csr(64, 64, 4, bandwidth=8, seed=3)
    w = pack_wsell(a)
    np.testing.assert_allclose(wsell_to_dense(w), a.todense())


def test_pack_wide_matrix_multi_window():
    # columns span many panels -> multiple rounds per row block
    a = datasets.random_csr(16, 2000, 40, seed=4)
    w = pack_wsell(a)
    assert w.num_rounds > 2
    np.testing.assert_allclose(wsell_to_dense(w), a.todense())


def test_pack_empty_rows():
    from sblas.formats import COO, coo_to_csr

    a = coo_to_csr(COO((20, 20), [0, 19], [5, 3], [1.0, 2.0]))
    w = pack_wsell(a)
    np.testing.assert_allclose(wsell_to_dense(w), a.todense())


def test_fem_fill_reasonable():
    a = datasets.emulate("cant", scale=0.2)
    w = pack_wsell(a)
    assert w.fill > 0.4, w.fill  # window-group padding costs ~20%


@pytest.mark.parametrize("gen", ["banded", "fem"])
def test_pallas_spmv_interpret(gen):
    from sblas.ops.kernels.spmv_pallas import PallasSpmv

    if gen == "banded":
        a = datasets.banded(300, 6, seed=5, dtype=np.float32)
    else:
        a = datasets.random_csr(256, 256, 10, bandwidth=30, seed=6,
                                dtype=np.float32)
    import jax.numpy as jnp

    p = PallasSpmv(a, min_fill=0.0)
    x = np.random.default_rng(7).standard_normal(a.shape[1]).astype(np.float32)
    import jax

    y = np.asarray(jax.jit(p.apply_traced)(jnp.asarray(x)))
    assert rel_err(y, spmv_golden(a, x)) < 2e-5


def test_pallas_rejects_f64_and_scattered():
    from sblas.ops.kernels.spmv_pallas import PallasSpmv

    with pytest.raises(ValueError):
        PallasSpmv(datasets.random_csr(64, 64, 4, seed=8, dtype=np.float64))
    scattered = datasets.random_csr(512, 100000, 4, seed=9, dtype=np.float32)
    with pytest.raises(ValueError):
        PallasSpmv(scattered)


@pytest.mark.parametrize("k", [1, 8])
def test_pallas_spmm_interpret(k):
    import jax
    import jax.numpy as jnp
    from sblas.ops.kernels.spmm_pallas import PallasSpmm
    from sblas.golden import spmm_golden

    a = datasets.random_csr(256, 256, 10, bandwidth=30, seed=16,
                            dtype=np.float32)
    p = PallasSpmm(a, min_fill=0.0)
    x = np.random.default_rng(17).standard_normal((256, k)).astype(np.float32)
    y = np.asarray(jax.jit(p.apply_pure)(p.device_arrays(), jnp.asarray(x)))
    assert rel_err(y, spmm_golden(a, x)) < 2e-5


@pytest.mark.parametrize("gen", ["band", "chol_like"])
def test_pallas_sptrsv_interpret(gen):
    import jax
    import jax.numpy as jnp
    from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv
    from sblas.golden import sptrsv_golden

    if gen == "band":
        l = datasets.lower_triangular(300, 4, bandwidth=12, seed=20,
                                      dtype=np.float32)
    else:
        l = datasets.lower_triangular(400, 8, bandwidth=60, seed=21,
                                      dtype=np.float32)
    p = PallasSptrsv(l)
    b = np.random.default_rng(22).standard_normal(l.shape[0]).astype(np.float32)
    x = np.asarray(jax.jit(p.apply_pure)(p.device_arrays(), jnp.asarray(b)))
    ref = sptrsv_golden(l, b)
    assert rel_err(x, ref) < 5e-4


def test_pallas_sptrsv_host_path():
    import jax
    from sblas.ops.kernels.sptrsv_pallas import PallasSptrsv
    from sblas.golden import sptrsv_golden
    import jax.numpy as jnp

    l = datasets.lower_triangular(256, 5, bandwidth=20, seed=23,
                                  dtype=np.float32)
    p = PallasSptrsv(l)
    b = np.random.default_rng(24).standard_normal(256).astype(np.float32)
    b2d = jnp.asarray(p.b_to_b2d(b))
    x2d = jax.jit(p.solve_permuted)(p.device_arrays(), b2d)
    x = p.x2d_to_x(np.asarray(x2d))
    assert rel_err(x, sptrsv_golden(l, b)) < 5e-4


@pytest.mark.parametrize("sub", [32, 64])
def test_pack_tall_sub(sub):
    # sub>16 once overflowed the native packer's fixed cursor buffers and
    # segfaulted on the smashed output pointers (e35's sub=32 combo); the
    # bound is now 128 with an explicit divides-128 check either side
    a = datasets.random_csr(600, 600, 12, bandwidth=80, seed=5)
    w = pack_wsell(a, sub=sub, cache=False)
    np.testing.assert_allclose(wsell_to_dense(w), a.todense())


def test_pack_rejects_bad_sub():
    a = datasets.random_csr(64, 64, 4, bandwidth=8, seed=3)
    with pytest.raises(ValueError, match="sub"):
        pack_wsell(a, sub=24, cache=False)
