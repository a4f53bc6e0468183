"""Microbench: per-row top-d_cap compaction of [M, S] slot maps on TPU."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

M, S, D = 16384, 864, 64
rng = np.random.RandomState(0)
slot_k = rng.randint(-1, 729, size=(S, M)).astype(np.int32)
slot_k[rng.rand(S, M) < 0.97] = -1  # ~3% valid, like real multimap slots
slot_in = rng.randint(0, M, size=(S, M)).astype(np.int32)
slot_in[slot_k < 0] = -1
K_TOTAL = 729


def bench(name, fn, *args, reps=5):
    red = jax.jit(lambda *a: sum(jnp.sum(jnp.asarray(x, jnp.float32))
                                 for x in fn(*a)))
    float(red(*args))
    t0 = time.time()
    for _ in range(reps):
        float(red(*args))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:8.1f} ms", flush=True)


def scatter_compact(sk, si):
    kt, it = sk.T, si.T
    valid = (kt >= 0) & (it >= 0)
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, kt.shape, 0)
    tgt = jnp.where(valid & (rank < D), rank, D)
    ek = jnp.full((M, D + 1), K_TOTAL, jnp.int32).at[rows, tgt].set(
        jnp.where(valid, kt, K_TOTAL), mode="drop")[:, :D]
    ei = jnp.full((M, D + 1), -1, jnp.int32).at[rows, tgt].set(
        it, mode="drop")[:, :D]
    return ek, ei


def topk_compact(sk, si):
    kt, it = sk.T, si.T
    valid = (kt >= 0) & (it >= 0)
    # key: valid first, then original slot order (stable)
    key = jnp.where(valid, S - jax.lax.broadcasted_iota(jnp.int32, kt.shape, 1),
                    -1)
    _, idx = jax.lax.top_k(key, D)  # [M, D]
    ek = jnp.take_along_axis(kt, idx, axis=1)
    ei = jnp.take_along_axis(it, idx, axis=1)
    got = jnp.take_along_axis(valid, idx, axis=1)
    return jnp.where(got, ek, K_TOTAL), jnp.where(got, ei, -1)


def matmul_compact(sk, si):
    kt, it = sk.T, si.T
    valid = (kt >= 0) & (it >= 0)
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(valid & (rank < D), rank, D)
    oh = jax.nn.one_hot(tgt, D + 1, dtype=jnp.float32)  # [M, S, D+1]
    vk = jnp.where(valid, kt + 1, 0).astype(jnp.float32)
    vi = jnp.where(valid, it + 1, 0).astype(jnp.float32)
    ok = jnp.einsum("ms,msd->md", vk, oh)[:, :D]
    oi = jnp.einsum("ms,msd->md", vi, oh)[:, :D]
    ek = jnp.where(ok > 0, ok - 1, K_TOTAL).astype(jnp.int32)
    ei = jnp.where(oi > 0, oi - 1, -1).astype(jnp.int32)
    return ek, ei


def sort_compact(sk, si):
    kt, it = sk.T, si.T
    valid = (kt >= 0) & (it >= 0)
    key = jnp.where(valid, jax.lax.broadcasted_iota(jnp.int32, kt.shape, 1),
                    S + 1)
    sk2, ek, ei = jax.lax.sort((key, kt, it), dimension=1, num_keys=1)
    ok = sk2[:, :D] <= S
    return (jnp.where(ok, ek[:, :D], K_TOTAL), jnp.where(ok, ei[:, :D], -1))


sk, si = jnp.asarray(slot_k), jnp.asarray(slot_in)
a = jax.jit(scatter_compact)(sk, si)
for name, fn in [("scatter", scatter_compact), ("topk", topk_compact),
                 ("matmul", matmul_compact), ("sort", sort_compact)]:
    b = jax.jit(fn)(sk, si)
    mk = np.sort(np.asarray(a[0]), 1)
    nk = np.sort(np.asarray(b[0]), 1)
    same = np.array_equal(mk, nk)
    bench(f"{name} (edges match={same})", fn, sk, si)
