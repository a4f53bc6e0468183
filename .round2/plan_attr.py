"""Attribute 6D plan-build device time to source lines."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.models import unet_plan as up
from deepglobalregistration_tpu.ops import kernel_map
from deepglobalregistration_tpu.utils.profiling import (
    attribute_trace, trace)

CAP = 16384
N = 14420
rng = np.random.RandomState(0)
c0 = np.full((CAP, 3), 32766, np.int32)
c1 = np.full((CAP, 3), 32766, np.int32)
base = rng.randint(0, 60, size=(N, 3))
c0[:N] = base
good = rng.rand(N) < 0.3
c1[:N] = np.where(good[:, None], base + 1, rng.randint(0, 60, size=(N, 3)))
num = jnp.int32(N)

@jax.jit
def plan_jit(a, b, n):
    return up.build_paired_unet_plan(a, b, n, 3, kernel_map.HYPER_CUBE, 4, 1,
                                     dense_extent=(256, 256, 256))

c0j, c1j = jnp.asarray(c0), jnp.asarray(c1)
txt = plan_jit.lower(c0j, c1j, num).compile().as_text()
p = plan_jit(c0j, c1j, num)
jax.block_until_ready(p)
with trace("/tmp/plan_attr"):
    p = plan_jit(c0j, c1j, num)
    jax.block_until_ready(p)
print("== plan device ms by source line:")
for k, v in attribute_trace("/tmp/plan_attr", txt, top=25).items():
    print(f"  {v:9.2f}  {k}")
print("== plan device ms by op path:")
for k, v in attribute_trace("/tmp/plan_attr", txt, top=15, by="op").items():
    print(f"  {v:9.2f}  {k}")
