"""Microbenchmark: gather formulations on the axon TPU."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

N_TAB = 16384
rng = np.random.RandomState(0)


def bench(name, fn, *args, reps=5):
    # block_until_ready does not truly block on the axon relay; force a
    # host readback of a scalar reduction instead.
    red = jax.jit(lambda *a: jnp.sum(jnp.asarray(fn(*a), jnp.float32)))
    float(red(*args))
    t0 = time.time()
    for _ in range(reps):
        v = float(red(*args))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:8.1f} ms", flush=True)
    return dt


tab = jnp.asarray(rng.rand(N_TAB).astype(np.float32))
tab_i = jnp.asarray(rng.randint(0, 1 << 30, N_TAB).astype(np.uint32))

for m in (1 << 21, 1 << 24):
    idx = jnp.asarray(rng.randint(0, N_TAB, m).astype(np.int32))
    idx_sorted = jnp.sort(idx)

    f = jax.jit(lambda t, i: t[i])
    bench(f"gather1d_random  m={m:>9}", f, tab, idx)
    bench(f"gather1d_sorted  m={m:>9}", f, tab, idx_sorted)

    # 2D-shaped idx like lookup: [8, chunkM]
    idx2 = idx.reshape(8, -1)
    f2 = jax.jit(lambda t, i: t[i])
    bench(f"gather2d_shape   m={m:>9}", f2, tab, idx2)

    # int32 value gather
    fi = jax.jit(lambda t, i: t[i])
    bench(f"gather1d_uint32  m={m:>9}", fi, tab_i, idx)

    # take_along_axis formulation on a [B, n] operand
    # one_hot matmul alternative for small tables: idx -> 128-bucket segments
    # dynamic-slice scan formulation skipped (obviously serial)

# gather from a [N_TAB, 8] 2-d operand, rows
tab8 = jnp.asarray(rng.rand(N_TAB, 8).astype(np.float32))
for m in (1 << 18, 1 << 21):
    idx = jnp.asarray(rng.randint(0, N_TAB, m).astype(np.int32))
    fr = jax.jit(lambda t, i: t[i])
    bench(f"gather_rows8     m={m:>9}", fr, tab8, idx)

# gather big rows [N, 32] (sparse conv gathers features like this)
tab32 = jnp.asarray(rng.rand(N_TAB, 32).astype(np.float32))
for m in (1 << 16, 1 << 18):
    idx = jnp.asarray(rng.randint(0, N_TAB, m).astype(np.int32))
    fr = jax.jit(lambda t, i: t[i])
    bench(f"gather_rows32    m={m:>9}", fr, tab32, idx)

# one-hot matmul gather for [m,32] rows: onehot[m, N_TAB] @ tab32 — MXU path
for m in (1 << 14,):
    idx = jnp.asarray(rng.randint(0, N_TAB, m).astype(np.int32))

    @jax.jit
    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i, N_TAB, dtype=jnp.bfloat16)
        return oh @ t.astype(jnp.bfloat16)

    bench(f"onehot_rows32    m={m:>9}", onehot_gather, tab32, idx)

# scatter-add (conv output side)
for m in (1 << 18,):
    idx = jnp.asarray(rng.randint(0, N_TAB, m).astype(np.int32))
    vals = jnp.asarray(rng.rand(m, 32).astype(np.float32))

    @jax.jit
    def scat(i, v):
        return jnp.zeros((N_TAB, 32), jnp.float32).at[i].add(v)

    bench(f"scatter_rows32   m={m:>9}", scat, idx, vals)
