"""Functional (order-independent) validation of the TPU-built edge map."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.ops import edge_conv

rng = np.random.RandomState(0)
km = np.full((729, 2048), -1, np.int32)
mask = rng.rand(729, 2048) < 0.01
km[mask] = rng.randint(0, 2048, size=int(mask.sum()))
for j in range(2048):
    v = np.where(km[:, j] >= 0)[0]
    if len(v) > 48:
        km[v[48:], j] = -1
em = jax.jit(lambda k: edge_conv.build_edge_map(k, d_cap=48, tile=128))(
    jnp.asarray(km))
em = jax.tree.map(np.asarray, em)

K, M = km.shape
T = 128
nt = em.tile_k.shape[0]
ti = em.tile_in.reshape(-1)
to = em.tile_out.reshape(-1)
tk_slot = np.repeat(em.tile_k, T)

# 1) edge multiset from tiles == expected multiset from km
got = set()
for s in range(nt * T):
    if tk_slot[s] >= 0 and ti[s] >= 0 and to[s] >= 0:
        got.add((int(tk_slot[s]), int(ti[s]), int(to[s])))
expect = set()
for k in range(K):
    for j in range(M):
        if km[k, j] >= 0:
            expect.add((k, int(km[k, j]), j))
print("edge sets equal:", got == expect,
      f"(got {len(got)}, expect {len(expect)}, missing {len(expect-got)}, "
      f"extra {len(got-expect)})")

# 2) tiles never mix offsets: check every real slot's bin via tile_k
# 3) out_slots: slot s = out_slots[m, d] must hold this row's d-th edge
bad = 0
kt = km.T
for m in range(M):
    v = np.where(kt[m] >= 0)[0]
    for d in range(48):
        s = em.out_slots[m, d]
        if d < len(v):
            if not (ti[s] == kt[m][v[d]] and to[s] == m
                    and tk_slot[s] == v[d]):
                bad += 1
                if bad < 4:
                    print(f"  bad slot m={m} d={d}: s={s} ti={ti[s]} "
                          f"to={to[s]} tk={tk_slot[s]} expect k={v[d]} "
                          f"in={kt[m][v[d]]}")
        else:
            if ti[s] >= 0 and to[s] >= 0 and tk_slot[s] >= 0:
                bad += 1  # invalid edge points at a REAL slot
                if bad < 4:
                    print(f"  invalid edge hits real slot m={m} d={d} s={s} "
                          f"ti={ti[s]} to={to[s]} tk={tk_slot[s]}")
print("out_slots bad entries:", bad)
