"""Split the match+inlier stage: 1-NN vs paired plan build vs inlier apply."""
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
from deepglobalregistration_tpu.models import unet_plan as up
from deepglobalregistration_tpu.ops import knn
from demo import synthetic_pair

config = default_config(
    feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
    inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
    voxel_size=0.05, inlier_feature_type="ones",
    dense_extent="256,256,256", bf16=True)
dgr = DeepGlobalRegistration(config)
xyz0, xyz1, _ = synthetic_pair(n=30000, seed=0)

raw_cap = _bucket_for(max(len(xyz0), len(xyz1)), dgr.buckets)
xyz_pair = jnp.asarray(np.stack([_pad_cloud(xyz0, raw_cap),
                                 _pad_cloud(xyz1, raw_cap)]))
nums = jnp.asarray([len(xyz0), len(xyz1)], np.int32)
xyz_sel, grids = dgr._quantize(xyz_pair, nums)
nvox = np.asarray(grids.num)
from deepglobalregistration_tpu.ops.sparse_grid import Grid
net_cap = _bucket_for(int(nvox.max()), dgr.buckets)
if net_cap != raw_cap:
    xyz_sel = xyz_sel[:, :net_cap]
    grids = Grid(coords=grids.coords[:, :net_cap], num=grids.num)
feats, _ = dgr._features(dgr.fcgf_params, dgr.fcgf_state, grids, grids.num)
feats.block_until_ready()
print(f"nvox={nvox} net_cap={net_cap}", flush=True)

icfg = dgr.inlier_cfg
ispec = dgr.inlier_spec

match_jit = jax.jit(lambda f0, f1, n0, n1: knn.find_nn(
    f0, f1, n0, n1, use_pallas=knn.pallas_ok()))

@jax.jit
def plan_jit(c0, c1, n0):
    return up.build_paired_unet_plan(
        c0, c1, n0, icfg.conv1_kernel_size, icfg.region_type, icfg.levels,
        dgr.level_shrink_6d)

@jax.jit
def apply_jit(params, state, plan, ifeat):
    plan_b = jax.tree.map(lambda x: x[None], plan)
    logits, _ = ispec.apply(params, state, icfg, plan_b, ifeat[None],
                            train=False)
    return logits

f0, f1 = feats[0], feats[1]
c0, c1 = grids.coords[0], grids.coords[1]
n0, n1 = grids.num[0], grids.num[1]

for rep in range(4):
    t = time.time()
    idx1, _ = match_jit(f0, f1, n0, n1)
    jax.block_until_ready(idx1)
    t_match = time.time() - t

    c1g = c1[idx1]
    t = time.time()
    plan = plan_jit(c0, c1g, n0)
    jax.block_until_ready(plan)
    t_plan = time.time() - t

    ifeat = jnp.ones((c0.shape[0], 1), dgr.compute_dtype)
    t = time.time()
    logits = apply_jit(dgr.inlier_params, dgr.inlier_state, plan, ifeat)
    jax.block_until_ready(logits)
    t_apply = time.time() - t
    tag = "compile" if rep == 0 else "steady"
    print(f"[{tag}] match={t_match*1000:.0f}ms plan={t_plan*1000:.0f}ms "
          f"apply={t_apply*1000:.0f}ms", flush=True)
