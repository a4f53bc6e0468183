"""Trace the pathological L1 edge-conv case to find the slow op."""
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

sys.path.insert(0, str(Path(__file__).resolve().parent))
from conv_variants import make_edges, one_shot, bench

rng = np.random.RandomState(1)
for label, m_cap, n_real, deg, k_total, d_cap, cin, cout in [
        ("L1 self 64ch", 16384, 13000, 8, 729, 16, 64, 64),
        ("L1b k343", 16384, 13000, 8, 343, 16, 64, 64),
        ("L1c k729 32ch", 16384, 13000, 8, 729, 16, 32, 32),
        ("L1d deg26 d27", 16384, 13000, 26, 729, 27, 64, 64),
]:
    em, nrt = make_edges(m_cap, n_real, deg, k_total, d_cap)
    feats = jnp.asarray(rng.randn(m_cap, cin), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(k_total + 1, cin, cout) * 0.1, jnp.bfloat16)
    f1 = jax.jit(lambda f_, k_, e_: one_shot(f_, k_, e_, m_cap))
    ms = bench(f1, feats, kernel, em)
    print(f"{label}: tiles={em.tile_k.shape[0]} real={nrt} oneshot={ms:.2f}ms",
          flush=True)
    if label == "L1 self 64ch":
        with trace("/tmp/l1_trace"):
            out = f1(feats, kernel, em)
            jax.block_until_ready(out)
        for name, tms in summarize_trace("/tmp/l1_trace", top=8).items():
            print(f"    {tms:9.2f}  {name}", flush=True)
