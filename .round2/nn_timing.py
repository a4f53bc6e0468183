"""Time the tuned Pallas 1-NN at ICP and matching shapes + ICP end-to-end."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.ops import icp as icp_ops
from deepglobalregistration_tpu.ops import knn
from deepglobalregistration_tpu.ops.pallas_knn import find_nn_pallas
from deepglobalregistration_tpu.utils.profiling import summarize_trace, trace

rng = np.random.RandomState(0)
N = 16384
NREAL = 14420


def bench(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t) / reps * 1000


for c, tag in ((3, "icp xyz"), (32, "feat match")):
    f0 = np.zeros((N, c), np.float32)
    f0[:NREAL] = rng.randn(NREAL, c)
    f1 = np.zeros((N, c), np.float32)
    f1[:NREAL] = rng.randn(NREAL, c)
    a = (jnp.asarray(f0), jnp.asarray(f1), jnp.int32(NREAL), jnp.int32(NREAL))
    ms = bench(find_nn_pallas, *a)
    # verify vs scan path
    i_p, d_p = find_nn_pallas(*a)
    i_s, d_s = jax.jit(knn.find_nn)(*a)
    ok = bool((np.asarray(i_p)[:NREAL] == np.asarray(i_s)[:NREAL]).all())
    derr = float(np.abs(np.asarray(d_p)[:NREAL] - np.asarray(d_s)[:NREAL]).max())
    print(f"{tag} (C={c}): {ms:.2f} ms/scan idx_ok={ok} d_err={derr:.2e}",
          flush=True)

# ICP end-to-end
xyz0 = np.zeros((N, 3), np.float32)
xyz0[:NREAL] = rng.rand(NREAL, 3) * 3
R = np.eye(3, dtype=np.float32)
xyz1 = np.zeros((N, 3), np.float32)
xyz1[:NREAL] = xyz0[:NREAL] + 0.01 * rng.randn(NREAL, 3).astype(np.float32)

@jax.jit
def icp_jit(a, b, na, nb):
    return icp_ops.registration_icp(a, b, na, nb, 0.1,
                                    use_pallas=True)

res = icp_jit(jnp.asarray(xyz0), jnp.asarray(xyz1), jnp.int32(NREAL),
              jnp.int32(NREAL))
jax.block_until_ready(res)
print(f"icp iterations: {int(res.iterations)} fitness={float(res.fitness):.4f}",
      flush=True)
ms = bench(icp_jit, jnp.asarray(xyz0), jnp.asarray(xyz1), jnp.int32(NREAL),
           jnp.int32(NREAL), reps=5)
print(f"icp end-to-end: {ms:.1f} ms", flush=True)
