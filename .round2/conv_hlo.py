"""HLO + trace of ONE isolated gather-path edge conv at L3 scale."""
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

rng = np.random.RandomState(0)
M, DEG, KT, DC, C = 16384, 20, 729, 64, 256
NR = 11000
km = np.full((KT, M), -1, np.int32)
for r in range(NR):
    dg = min(DC, max(1, int(rng.poisson(DEG))))
    ks = rng.choice(KT, dg, replace=False)
    km[ks, r] = rng.randint(0, NR, dg)

em = jax.jit(lambda k: ec.build_edge_map(k, d_cap=DC, tile=128))(
    jnp.asarray(km))
jax.block_until_ready(em)
feats = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
kern = jnp.asarray(rng.randn(KT + 1, C, C) * 0.1, jnp.bfloat16)

f = jax.jit(lambda f_, k_, e_: ec.sparse_conv_edges(f_, k_, e_, out_rows=M))
txt = f.lower(feats, kern, em).compile().as_text()
Path("/root/repo/.round2/conv_hlo.txt").write_text(txt)
out = f(feats, kern, em)
jax.block_until_ready(out)
t0 = time.time()
for _ in range(5):
    out = f(feats, kern, em)
    jax.block_until_ready(out)
print(f"wall {(time.time()-t0)/5*1000:.1f} ms/call")
with trace("/tmp/conv_hlo_trace"):
    out = f(feats, kern, em)
    jax.block_until_ready(out)
for name, ms in summarize_trace("/tmp/conv_hlo_trace", top=10).items():
    print(f"  {ms:8.2f}  {name}")

# count copies in the while body
import re
lines = txt.splitlines()
n_copy = sum(1 for l in lines if " copy(" in l)
print("copy ops in module:", n_copy)
for l in lines:
    if " copy(" in l and "f32" in l or (" copy(" in l and "bf16" in l):
        print("  ", l.strip()[:200])
