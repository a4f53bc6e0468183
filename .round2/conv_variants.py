"""Microbench edge-conv formulations at realistic 6D inlier-net shapes."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.ops import edge_conv as ec

TILE = 128


def make_edges(m_cap, n_real, deg, k_total, d_cap, seed=0):
    """Synthetic edge map: n_real rows with ~deg random in-edges each."""
    rng = np.random.RandomState(seed)
    edge_k = np.full((m_cap, d_cap), k_total, np.int32)
    edge_in = np.full((m_cap, d_cap), -1, np.int32)
    for r in range(n_real):
        d = min(d_cap, max(1, int(rng.poisson(deg))))
        edge_k[r, :d] = np.sort(rng.randint(0, k_total, d))
        edge_in[r, :d] = rng.randint(0, n_real, d)
    edge_out = np.broadcast_to(np.arange(m_cap, np.int32)[:, None] if False
                               else np.arange(m_cap, dtype=np.int32)[:, None],
                               (m_cap, d_cap))
    # bin by k (same as _edges_to_tiles, host-side for the bench)
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
    n_real_tiles = int((tile_k >= 0).sum())
    return em, n_real_tiles


def one_shot(feats, kernel, em, m):
    k_total, cin, cout = kernel.shape
    kernel = kernel.astype(feats.dtype)
    tin, tout, tk = em.tile_in, em.tile_out, em.tile_k
    w = kernel[jnp.maximum(tk, 0)]
    x = jnp.where((tin >= 0)[..., None], feats[jnp.maximum(tin, 0)], 0)
    y = jnp.einsum("ktc,kcd->ktd", x, w, preferred_element_type=jnp.float32)
    y = jnp.where((tk >= 0)[:, None, None], y, 0.0)
    idx = jnp.where(tout >= 0, tout, m)
    return jnp.zeros((m, cout), jnp.float32).at[idx.reshape(-1)].add(
        y.reshape(-1, cout), mode="drop")


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 10
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t) / reps * 1000


CASES = [
    # (label, m_cap, n_real, deg, k_total, d_cap, cin, cout)
    ("L0 conv1 32ch", 16384, 14420, 26, 343, 27, 32, 32),
    ("L1 self 64ch", 16384, 13000, 8, 729, 16, 64, 64),
    ("L2 self 128ch", 16384, 11500, 20, 729, 32, 128, 128),
    ("L3 self 256ch", 16384, 11000, 40, 729, 64, 256, 256),
]

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(1)
a = jnp.asarray(rng.randn(8192, 256), jnp.bfloat16)
b = jnp.asarray(rng.randn(256, 256), jnp.bfloat16)
mm = jax.jit(lambda a, b: a @ b)
print(f"calib matmul 8192x256x256: {bench(mm, a, b):.3f}ms", flush=True)

for label, m_cap, n_real, deg, k_total, d_cap, cin, cout in CASES:
    em, nrt = make_edges(m_cap, n_real, deg, k_total, d_cap)
    feats = jnp.asarray(rng.randn(m_cap, cin), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(k_total + 1, cin, cout) * 0.1, jnp.bfloat16)
    n_tiles = em.tile_k.shape[0]

    res = {}
    for chunk in (16, 64, 256):
        ec._TILE_CHUNK = chunk
        f = jax.jit(lambda f_, k_, e_: ec.sparse_conv_edges(f_, k_, e_))
        res[f"scan{chunk}"] = bench(f, feats, kernel, em)
    f1 = jax.jit(lambda f_, k_, e_: one_shot(f_, k_, e_, m_cap))
    res["oneshot"] = bench(f1, feats, kernel, em)
    chk = float(jnp.abs(f1(feats, kernel, em)).sum())
    print(f"{label}: tiles={n_tiles} real={nrt} chk={chk:.3g} " +
          " ".join(f"{k}={v:.2f}ms" for k, v in res.items()), flush=True)
