"""Per-stage wall clocks for register() on the real TPU (steady state)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import (
    DeepGlobalRegistration, _bucket_for, _pad_cloud)
from deepglobalregistration_tpu.ops.sparse_grid import Grid
from demo import synthetic_pair

config = default_config(
    feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
    inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
    voxel_size=0.05, inlier_feature_type="ones",
    dense_extent="256,256,256", bf16=True)
dgr = DeepGlobalRegistration(config)
xyz0, xyz1, _ = synthetic_pair(n=30000, seed=0)

# warm up everything once through the public path
t0 = time.time()
dgr.register(xyz0, xyz1)
print(f"warmup (compile) {time.time()-t0:.1f}s", flush=True)

REPS = 3
for rep in range(REPS):
    stages = {}
    t_all = time.time()

    t = time.time()
    raw_cap = _bucket_for(max(len(xyz0), len(xyz1)), dgr.buckets)
    xyz_pair = jnp.asarray(np.stack([_pad_cloud(xyz0, raw_cap),
                                     _pad_cloud(xyz1, raw_cap)]))
    nums = jnp.asarray([len(xyz0), len(xyz1)], np.int32)
    stages["h2d"] = time.time() - t

    t = time.time()
    xyz_sel, grids = dgr._quantize(xyz_pair, nums)
    nvox = np.asarray(grids.num)
    stages["quantize+sync"] = time.time() - t

    t = time.time()
    net_cap = _bucket_for(int(nvox.max()), dgr.buckets)
    if net_cap != raw_cap:
        xyz_sel = xyz_sel[:, :net_cap]
        grids = Grid(coords=grids.coords[:, :net_cap], num=grids.num)
    jax.block_until_ready(xyz_sel)
    stages["rebucket"] = time.time() - t

    t = time.time()
    feats, overflow = dgr._features(dgr.fcgf_params, dgr.fcgf_state,
                                    grids, grids.num)
    feats.block_until_ready()
    stages["features"] = time.time() - t

    t = time.time()
    idx1, weights, wsum_dev, overflow6 = dgr._match_and_inlier(
        dgr.inlier_params, dgr.inlier_state, feats[0], feats[1],
        xyz_sel[0], xyz_sel[1], grids.coords[0], grids.coords[1],
        grids.num[0], grids.num[1])
    wsum = float(wsum_dev)
    stages["match+inlier+sync"] = time.time() - t

    t = time.time()
    xyz0_corr = xyz_sel[0]
    xyz1_corr = xyz_sel[1][idx1]
    R, t_vec = dgr._refine(xyz0_corr, xyz1_corr, weights)
    jax.block_until_ready((R, t_vec))
    stages["refine"] = time.time() - t

    t = time.time()
    T = np.identity(4)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t_vec)
    Tj = dgr._icp_polish(xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1],
                         jnp.asarray(T, jnp.float32))
    jax.block_until_ready(Tj)
    stages["icp"] = time.time() - t

    stages["TOTAL"] = time.time() - t_all
    print(" | ".join(f"{k}={v*1000:.0f}ms" for k, v in stages.items()),
          flush=True)
