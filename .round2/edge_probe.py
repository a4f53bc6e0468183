"""Isolate which edge-map build component miscompiles on the TPU."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.ops import edge_conv, sparse_conv

rng = np.random.RandomState(0)
km = np.full((729, 2048), -1, np.int32)
mask = rng.rand(729, 2048) < 0.01
km[mask] = rng.randint(0, 2048, size=int(mask.sum()))
for j in range(2048):
    v = np.where(km[:, j] >= 0)[0]
    if len(v) > 48:
        km[v[48:], j] = -1
feats = rng.randn(2048, 16).astype(np.float32)
kern = rng.randn(729, 16, 16).astype(np.float32)

em = jax.jit(lambda k: edge_conv.build_edge_map(k, d_cap=48, tile=128))(
    jnp.asarray(km))
em = jax.tree.map(np.asarray, em)

# ---- numpy oracle of the same build --------------------------------------
K, M = km.shape
d_cap = 48
kt = km.T
edge_k = np.full((M, d_cap), K, np.int64)
edge_in = np.full((M, d_cap), -1, np.int64)
for mrow in range(M):
    v = np.where(kt[mrow] >= 0)[0]
    edge_k[mrow, : len(v)] = v
    edge_in[mrow, : len(v)] = kt[mrow][v]
edge_out = np.broadcast_to(np.arange(M)[:, None], (M, d_cap))
ek, ei, eo = edge_k.ravel(), edge_in.ravel(), edge_out.ravel()
order = np.argsort(ek, kind="stable")
eks, eis, eos = ek[order], ei[order], eo[order]
counts = np.bincount(eks, minlength=K + 1)
padded = -(-counts // 128) * 128
starts_pad = np.concatenate([[0], np.cumsum(padded)[:-1]])
starts_raw = np.concatenate([[0], np.cumsum(counts)[:-1]])
pos = starts_pad[eks] + (np.arange(len(eks)) - starts_raw[eks])
e_pad = -(-(len(ek) + (K + 1) * 128) // 128) * 128
n_tiles = e_pad // 128
tile_in = np.full(e_pad, -1, np.int64)
tile_out = np.full(e_pad, -1, np.int64)
tile_in[pos] = eis
tile_out[pos] = eos
first = np.arange(n_tiles) * 128
tkk = np.searchsorted(np.cumsum(padded), first, side="right")
tkk = np.minimum(tkk, K)
has_real = first - starts_pad[tkk] < counts[tkk]
tile_k = np.where((tkk < K) & has_real, tkk, -1)

print("tile_k equal:", np.array_equal(tile_k, em.tile_k))
print("tile_in equal:", np.array_equal(tile_in.reshape(n_tiles, 128),
                                       em.tile_in))
print("tile_out equal:", np.array_equal(tile_out.reshape(n_tiles, 128),
                                        em.tile_out))
# out_slots oracle: per original edge order, its pos
inv_slots = np.empty(len(ek), np.int64)
inv_slots[order] = pos
print("out_slots equal:", np.array_equal(inv_slots.reshape(M, d_cap),
                                         em.out_slots))

if not np.array_equal(tile_in.reshape(n_tiles, 128), em.tile_in):
    a = tile_in.reshape(n_tiles, 128)
    bad = np.argwhere(a != em.tile_in)
    print("first bad tile_in:", bad[:5], "expected",
          a[tuple(bad[0])], "got", em.tile_in[tuple(bad[0])])
if not np.array_equal(inv_slots.reshape(M, d_cap), em.out_slots):
    a = inv_slots.reshape(M, d_cap)
    bad = np.argwhere(a != em.out_slots)
    print("first bad out_slots:", bad[:5], "expected",
          a[tuple(bad[0])], "got", em.out_slots[tuple(bad[0])])
