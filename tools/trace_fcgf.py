#!/usr/bin/env python
"""Capture a device trace of the FCGF forward and print the top ops.

Run on the real TPU (nohup, never under a shell timeout — see
.claude/skills/verify/SKILL.md tunnel notes):

    nohup python tools/trace_fcgf.py [--dense_extent 256,256,256] &

This is the first thing to run next round: per-op wall-clock measurements on
the axon platform are unreliable (dispatch degradation), so the profiler trace
is the only trustworthy breakdown of the ~2 s/forward observed in round 1.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from deepglobalregistration_tpu.utils.platform import select_platform

select_platform()  # CPU fallback when the tunnel is dead (backend init hangs)

import jax.numpy as jnp
import numpy as np

from deepglobalregistration_tpu.models import load_model
from deepglobalregistration_tpu.ops.sparse_grid import voxelize
from deepglobalregistration_tpu.utils.profiling import summarize_trace, trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense_extent", type=str, default="")
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--cap", type=int, default=32768)
    ap.add_argument("--log_dir", type=str, default="/tmp/fcgf_trace")
    args = ap.parse_args()
    dense = tuple(int(x) for x in args.dense_extent.split(",")) if args.dense_extent else None

    rng = np.random.RandomState(0)
    xyz_p = np.zeros((args.cap, 3), np.float32)
    xyz_p[: args.points] = rng.rand(args.points, 3) * 3.0

    spec = load_model("ResUNetBN2C")
    cfg = spec.make_config(1, 32, bn_momentum=0.05, conv1_kernel_size=7,
                           normalize_feature=True, D=3)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def fcgf(params, state, xyz_p, num, feats):
        _, g0 = voxelize(xyz_p, num, 0.05)
        plan = jax.vmap(spec.build_plan, in_axes=(0, None, None, None))(
            jax.tree.map(lambda x: x[None], g0), cfg, 2, dense)
        out, _ = spec.apply(params, state, cfg, plan, feats[None], train=False)
        return out

    feats = jnp.ones((args.cap, 1), jnp.float32)
    t0 = time.time()
    out = jax.block_until_ready(fcgf(params, state, jnp.asarray(xyz_p),
                                     jnp.int32(args.points), feats))
    print(f"compile+run {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(5):
        out = fcgf(params, state, jnp.asarray(xyz_p), jnp.int32(args.points), feats)
    jax.block_until_ready(out)
    print(f"steady-state {(time.time() - t0) / 5 * 1000:.0f} ms "
          f"(dense_extent={dense})", flush=True)

    with trace(args.log_dir):
        for _ in range(2):
            out = fcgf(params, state, jnp.asarray(xyz_p), jnp.int32(args.points), feats)
        jax.block_until_ready(out)
    print("top device ops (ms):")
    for name, ms in summarize_trace(args.log_dir).items():
        print(f"  {ms:9.2f}  {name}")


if __name__ == "__main__":
    main()
