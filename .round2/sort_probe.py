"""Does a 4-operand single-key lax.sort keep payload tuples intact on axon?"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import numpy as np
import jax.numpy as jnp

rng = np.random.RandomState(1)
e = 98304 + 128
k = rng.randint(0, 730, size=e).astype(np.int32)
a = rng.randint(0, 1 << 30, size=e).astype(np.int32)
b = rng.randint(0, 1 << 30, size=e).astype(np.int32)
c = np.arange(e, dtype=np.int32)

@jax.jit
def s4(k, a, b, c):
    return jax.lax.sort((k, a, b, c), num_keys=1)

@jax.jit
def s2(k, c):
    return jax.lax.sort((k, c), num_keys=1)

ks, as_, bs, cs = jax.tree.map(np.asarray, s4(*map(jnp.asarray, (k, a, b, c))))
print("keys sorted:", bool((np.diff(ks) >= 0).all()))
# tuple integrity: payload triple at each position must equal the original
# tuple at index cs[i]
ok_k = bool((k[cs] == ks).all())
ok_a = bool((a[cs] == as_).all())
ok_b = bool((b[cs] == bs).all())
print(f"4-op: key-match={ok_k} payload1-match={ok_a} payload2-match={ok_b}")

ks2, cs2 = jax.tree.map(np.asarray, s2(jnp.asarray(k), jnp.asarray(c)))
print("2-op: keys sorted:", bool((np.diff(ks2) >= 0).all()),
      " perm valid:", bool((k[cs2] == ks2).all()),
      " perm is permutation:", len(np.unique(cs2)) == e)
