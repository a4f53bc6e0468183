"""Dump compiled HLO of the FCGF features jit; locate the hot fusions."""
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
from deepglobalregistration_tpu.ops.sparse_grid import Grid
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

lowered = dgr._features.lower(dgr.fcgf_params, dgr.fcgf_state, grids,
                              grids.num)
txt = lowered.compile().as_text()
Path("/root/repo/.round2/feat_hlo.txt").write_text(txt)
print(f"hlo chars: {len(txt)}")
lines = txt.splitlines()
for fid in ["fusion.38 ", "fusion.1165 ", "while.10 ", "fusion.1 ",
            "fusion.11 ", "fusion.39 "]:
    for i, line in enumerate(lines):
        s = line.strip()
        if s.startswith(f"%{fid}") or s.startswith(fid) or \
                f"%{fid}" in s.split("=")[0]:
            print(f"--- {fid}: {s[:400]}")
            break
