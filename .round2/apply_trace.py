"""Device-trace the inlier-net apply and the FCGF features jit."""
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
from deepglobalregistration_tpu.ops.sparse_grid import Grid
from deepglobalregistration_tpu.utils.profiling import summarize_trace, trace
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
net_cap = _bucket_for(int(nvox.max()), dgr.buckets)
if net_cap != raw_cap:
    xyz_sel = xyz_sel[:, :net_cap]
    grids = Grid(coords=grids.coords[:, :net_cap], num=grids.num)
feats, _ = dgr._features(dgr.fcgf_params, dgr.fcgf_state, grids, grids.num)
feats.block_until_ready()

icfg = dgr.inlier_cfg
ispec = dgr.inlier_spec

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
idx1, _ = knn.find_nn(f0, f1, n0, n1, use_pallas=knn.pallas_ok())
c1g = c1[idx1]
plan = plan_jit(c0, c1g, n0)
jax.block_until_ready(plan)
ifeat = jnp.ones((c0.shape[0], 1), dgr.compute_dtype)
logits = apply_jit(dgr.inlier_params, dgr.inlier_state, plan, ifeat)
jax.block_until_ready(logits)

with trace("/tmp/apply_trace"):
    logits = apply_jit(dgr.inlier_params, dgr.inlier_state, plan, ifeat)
    jax.block_until_ready(logits)
print("== inlier apply top device ops (ms):")
for name, ms in summarize_trace("/tmp/apply_trace", top=25).items():
    print(f"  {ms:9.2f}  {name}")

with trace("/tmp/feat_trace"):
    feats, _ = dgr._features(dgr.fcgf_params, dgr.fcgf_state, grids, grids.num)
    jax.block_until_ready(feats)
print("== features top device ops (ms):")
for name, ms in summarize_trace("/tmp/feat_trace", top=25).items():
    print(f"  {ms:9.2f}  {name}")

T0 = jnp.eye(4, dtype=jnp.float32)
Tj = dgr._icp_polish(xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1], T0)
jax.block_until_ready(Tj)
with trace("/tmp/icp_trace"):
    Tj = dgr._icp_polish(xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1], T0)
    jax.block_until_ready(Tj)
print("== icp top device ops (ms):")
for name, ms in summarize_trace("/tmp/icp_trace", top=15).items():
    print(f"  {ms:9.2f}  {name}")
