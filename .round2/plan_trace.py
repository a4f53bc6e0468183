"""Device-trace the 6D paired plan build to find the slow ops."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.models import unet_plan as up
from deepglobalregistration_tpu.ops import kernel_map
from deepglobalregistration_tpu.utils.profiling import summarize_trace, trace

CAP = 16384
N = 14420
rng = np.random.RandomState(0)
# synthetic correspondence coords: c0 unique-ish voxel coords, c1 = matched
c0 = np.full((CAP, 3), 32766, np.int32)
c1 = np.full((CAP, 3), 32766, np.int32)
base = rng.randint(0, 60, size=(N, 3))
c0[:N] = base
good = rng.rand(N) < 0.3
c1[:N] = np.where(good[:, None], base + 1, rng.randint(0, 60, size=(N, 3)))
num = jnp.int32(N)

@jax.jit
def plan_jit(c0, c1, n0):
    return up.build_paired_unet_plan(c0, c1, n0, 3, kernel_map.HYPER_CUBE,
                                     4, 1)

c0j, c1j = jnp.asarray(c0), jnp.asarray(c1)
t = time.time(); p = plan_jit(c0j, c1j, num); jax.block_until_ready(p)
print(f"compile+run {time.time()-t:.1f}s", flush=True)
for _ in range(2):
    t = time.time(); p = plan_jit(c0j, c1j, num); jax.block_until_ready(p)
    print(f"steady {time.time()-t:.2f}s", flush=True)

with trace("/tmp/plan_trace"):
    p = plan_jit(c0j, c1j, num)
    jax.block_until_ready(p)
print("top device ops (ms):")
for name, ms in summarize_trace("/tmp/plan_trace", top=40).items():
    print(f"  {ms:9.2f}  {name}")
