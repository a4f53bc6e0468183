"""Throughput of register_batch (fused vmapped pipeline) at several B."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
from demo import synthetic_pair

config = default_config(
    feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
    inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
    voxel_size=0.05, inlier_feature_type="ones",
    dense_extent="256,256,256", bf16=True)
dgr = DeepGlobalRegistration(config)

pairs = [synthetic_pair(n=30000, seed=s) for s in range(8)]
x0s = [p[0] for p in pairs]
x1s = [p[1] for p in pairs]

for B in (2, 4, 8):
    t = time.time()
    T = dgr.register_batch(x0s[:B], x1s[:B])
    print(f"B={B} first call (compile) {time.time()-t:.1f}s", flush=True)
    for rep in range(2):
        t = time.time()
        T = dgr.register_batch(x0s[:B], x1s[:B])
        dt = time.time() - t
        print(f"B={B} steady {dt:.2f}s -> {B/dt:.2f} pairs/s", flush=True)
