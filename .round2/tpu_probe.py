import time, sys
t0 = time.time()
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
print(f"import ok {time.time()-t0:.1f}s", flush=True)
d = jax.devices()
print(f"devices {d} {time.time()-t0:.1f}s", flush=True)
import jax.numpy as jnp
x = jnp.ones((256, 256))
y = (x @ x).block_until_ready()
print(f"matmul ok sum={float(y.sum())} {time.time()-t0:.1f}s", flush=True)
