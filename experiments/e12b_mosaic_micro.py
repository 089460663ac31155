"""Isolate which op in the SpTRSV dense-tail branch crashes Mosaic.

e12: chol-nd (n_dense=13) crashes the remote compiler at every th, while
band (n_dense=0) compiles — so the crash is one of the dense-branch ops:
  A: reshape (8,16) -> (1,128)        [sublane->lane relayout]
  B: dynamic row-slice of minvT + dot (1,128)@(128,128)
  C: A+B under nested pl.when
Each variant is a tiny one-tile kernel; a crash identifies the op.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
sys.path.insert(0, "/root/repo")

P = lambda *a: print(*a, flush=True)


def run(name, kern, out_shape, *args):
    try:
        y = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*args)
        P(f"{name}: OK {np.asarray(y).ravel()[:3]}")
    except Exception as e:
        P(f"{name}: FAIL {str(e)[:140]}")


def main():
    rng = np.random.default_rng(0)
    a816 = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    minv = jnp.asarray(rng.standard_normal((13 * 128, 128)).astype(np.float32))
    idx = jnp.asarray(np.int32(3))

    def ka(a_ref, o_ref):
        o_ref[:] = a_ref[:].reshape(1, 128)

    run("A reshape(8,16)->(1,128)", ka, (1, 128), a816)

    def kb(i_ref, m_ref, o_ref):
        db = i_ref[0]
        mv = m_ref[pl.ds(db * 128, 128), :]
        rhs = jnp.ones((1, 128), jnp.float32)
        o_ref[:] = jnp.dot(rhs, mv, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    try:
        y = pl.pallas_call(
            kb,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(jnp.asarray([3], jnp.int32), minv)
        P(f"B dyn-slice minv + (1,128)@(128,128): OK {np.asarray(y)[0,:2]}")
    except Exception as e:
        P(f"B dyn-slice minv + dot: FAIL {str(e)[:140]}")

    def kc(i_ref, a_ref, m_ref, o_ref):
        db = i_ref[0]

        @pl.when(db >= 0)
        def _():
            @pl.when(db == 3)
            def _():
                rhs = a_ref[:].reshape(1, 128)
                mv = m_ref[pl.ds(db * 128, 128), :]
                o_ref[:] = jnp.dot(rhs, mv,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    try:
        y = pl.pallas_call(
            kc,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(jnp.asarray([3], jnp.int32), a816, minv)
        P(f"C nested-when reshape+dot: OK {np.asarray(y)[0,:2]}")
    except Exception as e:
        P(f"C nested-when reshape+dot: FAIL {str(e)[:140]}")


if __name__ == "__main__":
    main()
