"""Attribute inlier-apply / features / icp device time to source lines."""
import sys
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
from deepglobalregistration_tpu.utils.profiling import attribute_trace, trace
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

icfg, ispec = dgr.inlier_cfg, dgr.inlier_spec


def report(tag, fn, *args):
    txt = fn.lower(*args).compile().as_text()
    out = fn(*args)
    jax.block_until_ready(out)
    with trace("/tmp/stage_attr"):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"== {tag} device ms by line:")
    for k, v in attribute_trace("/tmp/stage_attr", txt, top=20).items():
        print(f"  {v:9.2f}  {k}", flush=True)


# features
report("features", dgr._features, dgr.fcgf_params, dgf := dgr.fcgf_state,
       grids, grids.num)

feats, _ = dgr._features(dgr.fcgf_params, dgr.fcgf_state, grids, grids.num)
f0, f1 = feats[0], feats[1]
idx1, _ = knn.find_nn(f0, f1, grids.num[0], grids.num[1],
                      use_pallas=knn.pallas_ok())
c1g = grids.coords[1][idx1]

plan_jit = jax.jit(lambda a, b, n: up.build_paired_unet_plan(
    a, b, n, icfg.conv1_kernel_size, icfg.region_type, icfg.levels,
    dgr.level_shrink_6d, dense_extent=dgr.dense_extent))
plan = plan_jit(grids.coords[0], c1g, grids.num[0])
jax.block_until_ready(plan)

apply_jit = jax.jit(lambda p, s, pl_, f: ispec.apply(
    p, s, icfg, jax.tree.map(lambda x: x[None], pl_), f[None],
    train=False)[0])
ifeat = jnp.ones((grids.coords.shape[1], 1), dgr.compute_dtype)
report("inlier apply", apply_jit, dgr.inlier_params, dgr.inlier_state,
       plan, ifeat)

T0 = jnp.eye(4, dtype=jnp.float32)
report("icp", dgr._icp_polish, xyz_sel[0], xyz_sel[1], grids.num[0],
       grids.num[1], T0)
