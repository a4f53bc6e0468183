"""L3 (256ch) edge-conv variants: cond vs no-cond, chunk sizes, device time."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.ops import edge_conv as ec
from deepglobalregistration_tpu.utils.profiling import summarize_trace, trace

TILE = 128


def make_edges(m_cap, n_real, deg, k_total, d_cap, seed=0):
    rng = np.random.RandomState(seed)
    edge_k = np.full((m_cap, d_cap), k_total, np.int32)
    edge_in = np.full((m_cap, d_cap), -1, np.int32)
    for r in range(n_real):
        d = min(d_cap, max(1, int(rng.poisson(deg))))
        edge_k[r, :d] = np.sort(rng.randint(0, k_total, d))
        edge_in[r, :d] = rng.randint(0, n_real, d)
    edge_out = np.broadcast_to(np.arange(m_cap, dtype=np.int32)[:, None],
                               (m_cap, d_cap))
    ek, ei, eo = edge_k.ravel(), edge_in.ravel(), edge_out.ravel()
    order = np.argsort(ek, kind="stable")
    ek, ei, eo = ek[order], ei[order], eo[order]
    counts = np.bincount(ek, minlength=k_total + 1)
    padded = -(-counts // TILE) * TILE
    starts_pad = np.concatenate([[0], np.cumsum(padded)[:-1]])
    e_pad = int(padded.sum())
    n_tiles = e_pad // TILE
    tile_in = np.full(e_pad, -1, np.int32)
    tile_out = np.full(e_pad, -1, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = starts_pad[ek] + (np.arange(len(ek)) - starts[ek])
    tile_in[pos] = ei
    tile_out[pos] = eo
    first_slot = np.arange(n_tiles) * TILE
    tk = np.searchsorted(np.cumsum(padded), first_slot, side="right")
    tk = np.minimum(tk, k_total)
    has_real = first_slot - starts_pad[tk] < counts[tk]
    tile_k = np.where((tk < k_total) & has_real, tk, -1).astype(np.int32)
    em = ec.EdgeMap(tile_in=jnp.asarray(tile_in.reshape(n_tiles, TILE)),
                    tile_out=jnp.asarray(tile_out.reshape(n_tiles, TILE)),
                    tile_k=jnp.asarray(tile_k),
                    overflow=jnp.asarray(False))
    return em, int((tile_k >= 0).sum())


def conv_scan(feats, kernel, em, m, chunk, use_cond):
    k_total, cin, cout = kernel.shape
    kernel = kernel.astype(feats.dtype)
    n_tiles, t = em.tile_in.shape
    n_chunks = -(-n_tiles // chunk)
    pad_t = n_chunks * chunk - n_tiles
    tin = jnp.pad(em.tile_in, ((0, pad_t), (0, 0)), constant_values=-1)
    tout = jnp.pad(em.tile_out, ((0, pad_t), (0, 0)), constant_values=-1)
    tk = jnp.pad(em.tile_k, (0, pad_t), constant_values=-1)
    tin = tin.reshape(n_chunks, chunk, t)
    tout = tout.reshape(n_chunks, chunk, t)
    tk = tk.reshape(n_chunks, chunk)

    def body(acc, c):
        c_in, c_out, c_k = c

        def compute(acc):
            w = kernel[jnp.maximum(c_k, 0)]
            x = jnp.where((c_in >= 0)[..., None],
                          feats[jnp.maximum(c_in, 0)], 0)
            y = jnp.einsum("ktc,kcd->ktd", x, w,
                           preferred_element_type=jnp.float32)
            y = jnp.where((c_k >= 0)[:, None, None], y, 0.0)
            idx = jnp.where(c_out >= 0, c_out, m)
            return acc.at[idx.reshape(-1)].add(y.reshape(-1, cout),
                                               mode="drop")

        if use_cond:
            return jax.lax.cond(jnp.any(c_k >= 0), compute, lambda a: a,
                                acc), None
        return compute(acc), None

    acc0 = jnp.zeros((m, cout), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (tin, tout, tk))
    return out


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 10
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t) / reps * 1000


M, NR, DEG, KT, DC, C = 16384, 11000, 20, 729, 64, 256
em, nrt = make_edges(M, NR, DEG, KT, DC)
rng = np.random.RandomState(1)
feats = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
kernel = jnp.asarray(rng.randn(KT + 1, C, C) * 0.1, jnp.bfloat16)
print(f"tiles={em.tile_k.shape[0]} real={nrt}", flush=True)

best = None
for chunk in (64, 256, 512):
    for use_cond in (True, False):
        f = jax.jit(lambda f_, k_, e_, c=chunk, u=use_cond:
                    conv_scan(f_, k_, e_, M, c, u))
        ms = bench(f, feats, kernel, em)
        print(f"chunk={chunk} cond={use_cond}: {ms:.1f}ms", flush=True)
        if best is None or ms < best[0]:
            best = (ms, chunk, use_cond)

ms, chunk, use_cond = best
f = jax.jit(lambda f_, k_, e_: conv_scan(f_, k_, e_, M, chunk, use_cond))
out = f(feats, kernel, em)
jax.block_until_ready(out)
with trace("/tmp/l3_trace"):
    out = f(feats, kernel, em)
    jax.block_until_ready(out)
print(f"best chunk={chunk} cond={use_cond} -> device ops:")
for name, tms in summarize_trace("/tmp/l3_trace", top=8).items():
    print(f"  {tms:9.2f}  {name}", flush=True)
