import time, jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
N = 8*1024*1024
b = jnp.full((N,), 1.0, jnp.float32)
@jax.jit
def run(x, n):
    return lax.fori_loop(0, n, lambda i, x: x + b, x)
x0 = jnp.zeros((N,), jnp.float32)
t0=time.time(); r = run(x0, jnp.int32(5)); jax.block_until_ready(r)
print('compile', time.time()-t0, 'warm result[0] =', float(r[0]), flush=True)
for iters in (10, 100, 1000):
    t0=time.time(); r = jax.block_until_ready(run(x0, jnp.int32(iters))); t1=time.time()
    v = float(r[0]); t2=time.time()
    dt = t1-t0
    print(f'{iters} iters: loop {dt:.4f}s fetch {t2-t1:.4f}s result {v} -> {3*N*4*iters/dt/1e9:.1f} GB/s', flush=True)
