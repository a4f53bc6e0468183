"""Which gather formulations hit the fast path? (index rank, fusion, dtype)"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

N, B = 16384, 32
A, M = 27, 16384
rng = np.random.RandomState(0)
tab = jnp.asarray(rng.randint(0, 1 << 20, (N, B)).astype(np.int32))
idx2d = jnp.asarray(rng.randint(-1, N, (A, M)).astype(np.int32))
idx1d = idx2d.reshape(-1)


def bench(name, fn, *args, reps=5):
    red = jax.jit(lambda *a: jnp.sum(jnp.asarray(fn(*a), jnp.float32)))
    float(red(*args))
    t0 = time.time()
    for _ in range(reps):
        float(red(*args))
    print(f"{name}: {(time.time()-t0)/reps*1000:8.1f} ms", flush=True)


bench("rows32 idx1d clean      ", lambda t, i: t[jnp.maximum(i, 0)].reshape(A, M, B), tab, idx1d)
bench("rows32 idx2d clean      ", lambda t, i: t[jnp.maximum(i, 0)], tab, idx2d)
bench("rows32 idx1d nomax      ", lambda t, i: t[i], tab, jnp.maximum(idx1d, 0))
bench("rows32 idx2d nomax      ", lambda t, i: t[i], tab, jnp.maximum(idx2d, 0))
# take with mode clip
bench("rows32 take clip 1d     ", lambda t, i: jnp.take(t, i, axis=0, mode="clip"), tab, idx1d)
# gather then slice columns (simulate unpack use)
def g_use(t, i):
    r = t[jnp.maximum(i, 0)]
    return r[..., 0] + r[..., 1]
bench("rows32 idx2d use2cols   ", g_use, tab, idx2d)
# uint32 table
tabu = tab.astype(jnp.uint32)
bench("rows32 u32 idx2d        ", lambda t, i: t[jnp.maximum(i, 0)], tabu, idx2d)
# B=8
tab8 = tab[:, :8]
bench("rows8  idx2d clean      ", lambda t, i: t[jnp.maximum(i, 0)], tab8, idx2d)
# one-hot matmul gather of rows32 via f32 MXU
def onehot_rows(t, i):
    oh = jax.nn.one_hot(jnp.maximum(i, 0), N, dtype=jnp.float32)  # [A, M, N]
    return jnp.einsum("amn,nb->amb", oh, t.astype(jnp.float32))
bench("rows32 onehot matmul    ", onehot_rows, tab, idx2d)
