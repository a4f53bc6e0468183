#!/usr/bin/env python
"""Trace the 6D and 3D plan builds in ISOLATION for clean op attribution.

tools/stage_budget.py ground truth: plan6d 205 ms + fcgf_plan 108 ms = 61%
of the 515 ms pair budget. The fused-program per-line attribution double
counts; tracing each build as its own program makes the op table exact.

Run:  nohup python tools/plan_trace.py --weights weights/fcgf_synthetic.pkl &
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from deepglobalregistration_tpu.utils.platform import select_platform

select_platform()

import numpy as np
import jax.numpy as jnp

from deepglobalregistration_tpu.utils.profiling import (
    attribute_trace, summarize_trace, trace)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--weights", type=str, default=None)
    args = ap.parse_args()

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
    from deepglobalregistration_tpu.models import unet_plan as up
    from deepglobalregistration_tpu.ops import knn
    from demo import synthetic_pair

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7, inlier_model="ResUNetBN2C",
        inlier_conv1_kernel_size=3, voxel_size=0.05,
        inlier_feature_type="ones", weights=args.weights,
        dense_extent="256,256,256", bf16=True)
    dgr = DeepGlobalRegistration(config)
    cap = 16384

    xyz0, xyz1, _ = synthetic_pair(n=args.points, seed=1)
    pair = jnp.stack([
        jnp.pad(jnp.asarray(xyz0[:cap], jnp.float32),
                ((0, max(0, cap - len(xyz0))), (0, 0))),
        jnp.pad(jnp.asarray(xyz1[:cap], jnp.float32),
                ((0, max(0, cap - len(xyz1))), (0, 0)))])
    nums = jnp.asarray([min(len(xyz0), cap), min(len(xyz1), cap)], jnp.int32)
    xyz_sel, grids = dgr._quantize(pair, nums)
    feats, _ = dgr._features(dgr.fcgf_params, dgr.fcgf_state, grids, grids.num)
    idx1, _ = jax.jit(lambda a, b, c, d: knn.find_nn(
        a, b, c, d, use_pallas=knn.pallas_ok()))(
        feats[0], feats[1], grids.num[0], grids.num[1])
    c0, c1 = grids.coords[0], grids.coords[1][idx1]

    fcgf_spec, fcgf_cfg = dgr.fcgf_spec, dgr.fcgf_cfg
    inlier_cfg = dgr.inlier_cfg

    @jax.jit
    def plan6d(c0, c1, n0):
        return up.build_paired_unet_plan(
            c0, c1, n0, inlier_cfg.conv1_kernel_size, inlier_cfg.region_type,
            inlier_cfg.levels, dgr.level_shrink_6d,
            dense_extent=dgr.dense_extent,
            budget_scale=dgr.edge_budget_scale)

    @jax.jit
    def fcgf_plan(grids):
        return jax.vmap(fcgf_spec.build_plan,
                        in_axes=(0, None, None, None, None))(
            grids, fcgf_cfg, dgr.level_shrink, dgr.dense_extent, True)

    for name, fn, fa in (("plan6d", plan6d, (c0, c1, grids.num[0])),
                         ("fcgf_plan", fcgf_plan, (grids,))):
        out = jax.block_until_ready(fn(*fa))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*fa))
        print(f"{name}: {(time.perf_counter() - t0) * 1e3:.1f} ms "
              "(single dispatch, memoization-tainted; see stage_budget)",
              flush=True)
        log_dir = f"/tmp/{name}_trace"
        with trace(log_dir):
            jax.block_until_ready(fn(*fa))
        print(f"top device ops for {name} (ms):")
        for op, ms in summarize_trace(log_dir, top=28).items():
            print(f"  {ms:9.2f}  {op}")
        txt = jax.jit(fn).lower(*fa).compile().as_text()
        print(f"per-line attribution for {name} (ms):")
        for key, ms in attribute_trace(log_dir, txt, top=40).items():
            print(f"  {ms:9.2f}  {key}")
        print(flush=True)


if __name__ == "__main__":
    main()
