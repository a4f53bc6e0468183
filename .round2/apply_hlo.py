"""Dump compiled HLO of the 6D inlier apply; locate hot whiles/fusions."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
from deepglobalregistration_tpu.models import unet_plan as up
from deepglobalregistration_tpu.ops import kernel_map

config = default_config(
    feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
    inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
    voxel_size=0.05, inlier_feature_type="ones",
    dense_extent="256,256,256", bf16=True)
dgr = DeepGlobalRegistration(config)
icfg, ispec = dgr.inlier_cfg, dgr.inlier_spec

CAP = 16384
N = 14420
rng = np.random.RandomState(0)
c0 = np.full((CAP, 3), 32766, np.int32)
c1 = np.full((CAP, 3), 32766, np.int32)
base = rng.randint(0, 60, size=(N, 3))
c0[:N] = base
good = rng.rand(N) < 0.3
c1[:N] = np.where(good[:, None], base + 1,
                  rng.randint(0, 60, size=(N, 3)))

plan = jax.jit(lambda a, b, n: up.build_paired_unet_plan(
    a, b, n, icfg.conv1_kernel_size, icfg.region_type, icfg.levels,
    dgr.level_shrink_6d))(jnp.asarray(c0), jnp.asarray(c1), jnp.int32(N))

def apply_fn(params, state, plan, ifeat):
    plan_b = jax.tree.map(lambda x: x[None], plan)
    logits, _ = ispec.apply(params, state, icfg, plan_b, ifeat[None],
                            train=False)
    return logits

ifeat = jnp.ones((CAP, 1), dgr.compute_dtype)
txt = jax.jit(apply_fn).lower(dgr.inlier_params, dgr.inlier_state, plan,
                              ifeat).compile().as_text()
Path("/root/repo/.round2/apply_hlo.txt").write_text(txt)
print(f"hlo chars: {len(txt)}")
lines = txt.splitlines()
import re
for target in ["while.73 ", "while.74 ", "fusion.804 ", "fusion.817 ",
               "while.72 ", "fusion.791 ", "while.63 "]:
    for i, line in enumerate(lines):
        s = line.strip()
        if s.startswith(f"%{target}") or (f"%{target}" in s and "=" in s and
                                          s.index("=") > s.find(f"%{target}")):
            print(f"--- {target}: {s[:380]}")
            break
