"""Which 6D plan component overflows at 3DMatch scale? + current stage split."""
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
from deepglobalregistration_tpu.ops import edge_conv as ec
from deepglobalregistration_tpu.ops import kernel_map, paired_kernel_map
from deepglobalregistration_tpu.ops import knn
from deepglobalregistration_tpu.ops.sparse_grid import Grid, stride_down
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
idx1, _ = jax.jit(lambda a, b, c, d: knn.find_nn(a, b, c, d))(
    feats[0], feats[1], grids.num[0], grids.num[1])

c0 = grids.coords[0]
c1 = grids.coords[1][idx1]
num = grids.num[0]
offs3 = kernel_map.kernel_offsets(3, 6, kernel_map.HYPER_CUBE)


@jax.jit
def probe(c0, c1, num):
    grid0 = Grid(coords=jnp.concatenate([c0, c1], axis=1), num=num)
    gs = [grid0]
    for level in range(1, 4):
        gs.append(stride_down(gs[-1], 2 ** level, out_capacity=grid0.capacity))
    out = {}
    out["grid_nums"] = jnp.stack([g.num for g in gs])
    for i, g in enumerate(gs):
        b = int(min(8 ** i, up._B_CAP_6D)) if i else 2
        mm = paired_kernel_map.build_multimap(g.coords[:, :3], g.coords[:, 3:],
                                              g.num, b)
        out[f"mm{i}_overflow"] = mm.overflow
        if i >= 1:
            sk, si, _ = paired_kernel_map.edge_slots_from_multimap(
                mm, g.coords[:, :3], g.coords[:, 3:], g.num, offs3, 2 ** i)
            valid = (sk >= 0) & (si >= 0)
            deg = jnp.sum(valid.astype(jnp.int32), axis=0)
            out[f"self{i}_maxdeg"] = jnp.max(deg)
            out[f"self{i}_meandeg"] = jnp.sum(deg) / jnp.maximum(g.num, 1)
        if i < 3:
            sk, si, _ = paired_kernel_map.edge_slots_from_multimap(
                mm, gs[i + 1].coords[:, :3], gs[i + 1].coords[:, 3:],
                gs[i + 1].num, offs3, 2 ** i)
            valid = (sk >= 0) & (si >= 0)
            deg = jnp.sum(valid.astype(jnp.int32), axis=0)
            out[f"down{i}_maxdeg"] = jnp.max(deg)
    return out

res = {k: np.asarray(v) for k, v in probe(c0, c1, num).items()}
for k, v in res.items():
    print(k, v, flush=True)
