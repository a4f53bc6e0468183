"""Dump compiled HLO of the plan build and locate the hot fusions."""
import sys, re
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.models import unet_plan as up
from deepglobalregistration_tpu.ops import kernel_map

CAP = 16384
N = 14420
rng = np.random.RandomState(0)
c0 = np.full((CAP, 3), 32766, np.int32)
c1 = np.full((CAP, 3), 32766, np.int32)
base = rng.randint(0, 60, size=(N, 3))
c0[:N] = base
good = rng.rand(N) < 0.3
c1[:N] = np.where(good[:, None], base + 1, rng.randint(0, 60, size=(N, 3)))

def plan_fn(c0, c1, n0):
    return up.build_paired_unet_plan(c0, c1, n0, 3, kernel_map.HYPER_CUBE, 4, 1)

lowered = jax.jit(plan_fn).lower(jnp.asarray(c0), jnp.asarray(c1),
                                 jnp.int32(N))
txt = lowered.compile().as_text()
Path("/root/repo/.round2/plan_hlo.txt").write_text(txt)
print(f"hlo chars: {len(txt)}")
for fid in ["fusion.136", "fusion.146", "fusion.176", "fusion.166",
            "fusion.126", "fusion.263", "fusion.142"]:
    for line in txt.splitlines():
        if f" {fid} " in line or f"%{fid} " in line:
            print(f"--- {fid}: {line.strip()[:300]}")
            break
