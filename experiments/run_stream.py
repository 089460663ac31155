import time, jax, jax.numpy as jnp
from jax import lax
N = 8*1024*1024
print('start', flush=True)
b = jnp.full((N,), 1e-9, jnp.float32); b.block_until_ready(); print('alloc ok', flush=True)
@jax.jit
def run(x, n):
    return lax.fori_loop(0, n, lambda i, x: x + 1e-6*b, x)
x0 = jnp.zeros((N,), jnp.float32)
t0=time.time(); jax.block_until_ready(run(x0, jnp.int32(1))); print('compile+1iter', time.time()-t0, flush=True)
for iters in (10, 100):
    t0=time.time(); jax.block_until_ready(run(x0, jnp.int32(iters))); dt=time.time()-t0
    print(iters, 'iters', f'{dt:.4f}s ->', 3*N*4*iters/dt/1e9, 'GB/s', flush=True)
