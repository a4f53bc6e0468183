#!/usr/bin/env python
"""ICP stage cost breakdown on the real chip (round-4 trace: the checked
fallback branch dominates register() at ~267 ms of 554 ms device time).

Times, at bench shape (voxelized ~11k points, bucket 16384):
  - spatial 1-NN full scan (one iteration's search)
  - candidate-list build
  - candidate ICP alone (+ iterations until stale/done)
  - full-scan ICP alone (+ iterations used)       <- is early-exit firing?
  - checked wrapper (candidate + cond full rerun)
for two inits: near-converged (GT + 1 cm) and coarse (GT + 10 cm / 5 deg).

Run: nohup python tools/icp_probe.py > /tmp/icp_probe.log 2>&1 &
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from deepglobalregistration_tpu.utils.platform import select_platform

select_platform()

import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1000, out


def main():
    from demo import synthetic_pair
    from deepglobalregistration_tpu.ops import icp as icp_ops
    from deepglobalregistration_tpu.ops import knn, se3, sparse_grid

    voxel = 0.05
    xyz0, xyz1, T_gt = synthetic_pair(n=30000, seed=0)
    cap = 16384

    def vox(x):
        xp = np.zeros((cap * 2, 3), np.float32)
        xp[: len(x)] = x
        sel, g = jax.jit(lambda p, n: sparse_grid.voxelize(p, n, voxel))(
            jnp.asarray(xp), jnp.int32(len(x)))
        m = int(g.num)
        out = np.zeros((cap, 3), np.float32)
        out[:m] = np.asarray(sel)[:m]
        return jnp.asarray(out), jnp.int32(m)

    s0, n0 = vox(xyz0)
    s1, n1 = vox(xyz1)
    print(f"voxel counts: {int(n0)}, {int(n1)}", flush=True)

    rng = np.random.RandomState(0)
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)

    def perturb(T, trans_m, rot_deg):
        th = np.deg2rad(rot_deg)
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = trans_m * axis
        return jnp.asarray((P @ np.asarray(T)).astype(np.float32))

    inits = {"near (1cm)": perturb(T_gt, 0.01, 0.0),
             "coarse (10cm/5deg)": perturb(T_gt, 0.10, 5.0)}
    mc = 2 * voxel

    nn1 = jax.jit(lambda a, b: knn.find_nn(a, b, n0, n1))
    ms, _ = bench(nn1, s0, s1)
    print(f"spatial 1-NN full scan: {ms:.2f} ms", flush=True)

    build = jax.jit(lambda m0: icp_ops._build_candidates(m0, s1, n1, cell=mc))
    ms, _ = bench(build, se3.apply_transform(s0, inits["near (1cm)"]))
    print(f"candidate build: {ms:.2f} ms", flush=True)

    cand = jax.jit(lambda T: icp_ops.registration_icp(
        s0, s1, n0, n1, mc, init=T, use_candidates=True))
    full = jax.jit(lambda T: icp_ops.registration_icp(
        s0, s1, n0, n1, mc, init=T, use_candidates=False))
    checked = jax.jit(lambda T: icp_ops.registration_icp_checked(
        s0, s1, n0, n1, mc, init=T))

    for name, T in inits.items():
        for label, fn in [("cand", cand), ("full", full), ("checked", checked)]:
            ms, res = bench(fn, T)
            print(json.dumps({
                "init": name, "mode": label, "ms": round(ms, 2),
                "iters": int(res.iterations), "fitness": round(float(res.fitness), 4),
                "cand_ok": bool(res.cand_ok),
                "rmse": round(float(res.inlier_rmse), 6)}), flush=True)


if __name__ == "__main__":
    main()
