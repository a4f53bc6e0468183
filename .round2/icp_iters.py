"""How many iterations does ICP run on the bench pair?"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import numpy as np, jax.numpy as jnp
from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import (
    DeepGlobalRegistration, _bucket_for, _pad_cloud)
from deepglobalregistration_tpu.ops.sparse_grid import Grid
from deepglobalregistration_tpu.ops import icp as icp_ops
from demo import synthetic_pair

config = default_config(
    feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
    inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
    voxel_size=0.05, inlier_feature_type="ones",
    dense_extent="256,256,256", bf16=True)
dgr = DeepGlobalRegistration(config)
xyz0, xyz1, _ = synthetic_pair(n=30000, seed=0)
raw_cap = _bucket_for(max(len(xyz0), len(xyz1)), dgr.buckets)
xp = jnp.asarray(np.stack([_pad_cloud(xyz0, raw_cap), _pad_cloud(xyz1, raw_cap)]))
nums = jnp.asarray([len(xyz0), len(xyz1)], np.int32)
xyz_sel, grids = dgr._quantize(xp, nums)
nvox = np.asarray(grids.num)
cap = _bucket_for(int(nvox.max()), dgr.buckets)
xyz_sel = xyz_sel[:, :cap]
grids = Grid(coords=grids.coords[:, :cap], num=grids.num)
feats, _ = dgr._features(dgr.fcgf_params, dgr.fcgf_state, grids, grids.num)
idx1, w, wsum, _ = dgr._match_and_inlier(
    dgr.inlier_params, dgr.inlier_state, feats[0], feats[1], xyz_sel[0],
    xyz_sel[1], grids.coords[0], grids.coords[1], grids.num[0], grids.num[1])
R, t = dgr._refine(xyz_sel[0], xyz_sel[1][idx1], w)
T = np.eye(4, dtype=np.float32); T[:3, :3] = np.asarray(R); T[:3, 3] = np.asarray(t)

res = jax.jit(lambda a, b, na, nb, T0: icp_ops.registration_icp(
    a, b, na, nb, 0.1, init=T0, use_pallas=True))(
    xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1], jnp.asarray(T))
print(f"iterations={int(res.iterations)} fitness={float(res.fitness):.4f} "
      f"rmse={float(res.inlier_rmse):.5f}")
