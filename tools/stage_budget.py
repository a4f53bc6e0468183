#!/usr/bin/env python
"""Ground-truth per-stage device budget of the register() pipeline.

The HLO per-line attribution (tools/trace_register.py) double-counts fused
ops — r5 found a "110 ms einsum pool" whose 4x FLOP reduction moved the
fused wall by ~4 ms. This times the pipeline's own staged jits
(core/pipeline._build_jits: quantize/features/match_and_inlier/refine/
icp_polish) over R DISTINCT pre-staged inputs (the tunnel memoizes
(program, inputs) pairs; same-input repeats pipeline into fake rates —
tools/gather_bench.py methodology note), dispatches pipelined, one block
at the end. Stage sums won't equal the fused wall exactly (fusion across
stage boundaries), but the proportions are trustworthy.

Run:  nohup python tools/stage_budget.py --weights weights/fcgf_synthetic.pkl &
Never timeout-kill TPU scripts (.claude/skills/verify).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--loops", type=int, default=4)
    args = ap.parse_args()

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
    from demo import synthetic_pair

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7, inlier_model="ResUNetBN2C",
        inlier_conv1_kernel_size=3, voxel_size=0.05,
        inlier_feature_type="ones", weights=args.weights,
        dense_extent="256,256,256", bf16=True)
    dgr = DeepGlobalRegistration(config)

    # One full register() to pick the speculative bucket + warm every cache.
    xyz0, xyz1, _ = synthetic_pair(n=args.points, seed=0)
    t0 = time.time()
    T0 = dgr.register(xyz0, xyz1)
    print(f"warm register(): {time.time() - t0:.0f}s  cap="
          f"{dgr._net_cap_guess}", flush=True)
    cap = dgr._net_cap_guess

    # Pre-stage R distinct pairs through the chain, keeping device inputs of
    # every stage.
    R = args.pairs
    stage_inputs = {"quantize": [], "features": [], "match": [],
                    "refine": [], "icp": []}
    for seed in range(R):
        a, b, _ = synthetic_pair(n=args.points, seed=seed)
        n0 = min(len(a), cap)
        pair = jnp.stack([
            jnp.pad(jnp.asarray(a[:cap], jnp.float32), ((0, cap - n0), (0, 0))),
            jnp.pad(jnp.asarray(b[:cap], jnp.float32), ((0, cap - n0), (0, 0)))])
        nums = jnp.asarray([min(len(a), cap), min(len(b), cap)], jnp.int32)
        stage_inputs["quantize"].append((pair, nums))
        xyz_sel, grids = dgr._quantize(pair, nums)
        stage_inputs["features"].append((grids,))
        feats, _ = dgr._features(dgr.fcgf_params, dgr.fcgf_state, grids,
                                 grids.num)
        stage_inputs["match"].append(
            (feats[0], feats[1], xyz_sel[0], xyz_sel[1], grids.coords[0],
             grids.coords[1], grids.num[0], grids.num[1]))
        idx1, w, wsum, _ = dgr._match_and_inlier(
            dgr.inlier_params, dgr.inlier_state, *stage_inputs["match"][-1])
        xyz0c, xyz1c = xyz_sel[0], xyz_sel[1][idx1]
        stage_inputs["refine"].append((xyz0c, xyz1c, w))
        Rr, t = dgr._refine(xyz0c, xyz1c, w)
        from deepglobalregistration_tpu.ops import se3
        T = se3.rt_to_matrix(Rr, t)
        stage_inputs["icp"].append(
            (xyz_sel[0], xyz_sel[1], grids.num[0], grids.num[1], T))
    jax.block_until_ready(stage_inputs["icp"][-1][-1])
    print("staged inputs ready", flush=True)

    def timed(fn, inputs, label):
        # warm each distinct input once (compile done; memoization primed is
        # fine — the measured pass uses the same set, marginal over loops)
        for inp in inputs:
            out = fn(*inp)
        jax.block_until_ready(out)
        t_lo = None
        for loops in (1, 1 + args.loops):
            t0 = time.perf_counter()
            for _ in range(loops):
                for inp in inputs:
                    out = fn(*inp)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            if t_lo is None:
                t_lo = dt
        per = (dt - t_lo) / (args.loops * len(inputs))
        print(f"{label:>10}: {per * 1e3:7.2f} ms/call", flush=True)
        return per

    total = 0.0
    total += timed(dgr._quantize, stage_inputs["quantize"], "quantize")
    total += timed(lambda g: dgr._features(dgr.fcgf_params, dgr.fcgf_state,
                                           g, g.num),
                   stage_inputs["features"], "fcgf(B=2)")
    total += timed(lambda *i: dgr._match_and_inlier(
        dgr.inlier_params, dgr.inlier_state, *i),
        stage_inputs["match"], "match+6D")
    total += timed(dgr._refine, stage_inputs["refine"], "refine")
    total += timed(dgr._icp_polish, stage_inputs["icp"], "icp")
    print(f"stage sum: {total * 1e3:.0f} ms/pair", flush=True)

    # ---------------- sub-stage decomposition --------------------------
    from deepglobalregistration_tpu.models import unet_plan as up
    from deepglobalregistration_tpu.ops import knn

    fcgf_spec, fcgf_cfg = dgr.fcgf_spec, dgr.fcgf_cfg
    inlier_spec, inlier_cfg = dgr.inlier_spec, dgr.inlier_cfg
    use_pallas = knn.pallas_ok()

    @jax.jit
    def fcgf_plan(grids):
        return jax.vmap(fcgf_spec.build_plan, in_axes=(0, None, None, None,
                                                       None))(
            grids, fcgf_cfg, dgr.level_shrink, dgr.dense_extent, True)

    @jax.jit
    def fcgf_fwd(plan, cap_feats):
        out, _ = fcgf_spec.apply(dgr.fcgf_params, dgr.fcgf_state, fcgf_cfg,
                                 plan, cap_feats, train=False)
        return out

    @jax.jit
    def nn_only(f0, f1, n0, n1):
        return knn.find_nn(f0, f1, n0, n1, use_pallas=use_pallas)

    @jax.jit
    def plan6d(c0, c1, n0):
        return up.build_paired_unet_plan(
            c0, c1, n0, inlier_cfg.conv1_kernel_size, inlier_cfg.region_type,
            inlier_cfg.levels, dgr.level_shrink_6d,
            dense_extent=dgr.dense_extent,
            budget_scale=dgr.edge_budget_scale)

    @jax.jit
    def inlier_fwd(plan, ifeat):
        out, _ = inlier_spec.apply(dgr.inlier_params, dgr.inlier_state,
                                   inlier_cfg, plan, ifeat, train=False)
        return out

    sub = {"fcgf_plan": [], "fcgf_fwd": [], "nn": [], "plan6d": [],
           "inlier_fwd": []}
    for (grids,), m_in in zip(stage_inputs["features"], stage_inputs["match"]):
        sub["fcgf_plan"].append((grids,))
        plan = fcgf_plan(grids)
        ones = jnp.ones(grids.coords.shape[:2] + (1,), dgr.compute_dtype)
        sub["fcgf_fwd"].append((plan, ones))
        f0, f1, x0, x1, c0g, c1g, n0, n1 = m_in
        sub["nn"].append((f0, f1, n0, n1))
        idx1, _ = nn_only(f0, f1, n0, n1)
        c0, c1 = c0g, c1g[idx1]
        sub["plan6d"].append((c0, c1, n0))
        p6 = plan6d(c0, c1, n0)
        p6 = jax.tree.map(lambda x: x[None], p6)
        ifeat = jnp.ones((c0.shape[0], 1), dgr.compute_dtype)[None]
        sub["inlier_fwd"].append((p6, ifeat))
    jax.block_until_ready(sub["inlier_fwd"][-1][-1])
    print("sub-stage inputs ready", flush=True)
    # inlier_fwd is OFF by default: compiling the standalone (batched) inlier
    # forward consistently wedged the tunnel's compile service for 30+ min
    # before dying with a remote_compile broken pipe (r5 logs
    # /tmp/stage_budget*.log), torpedoing the whole run. Its cost is
    # recoverable as match+6D - plan6d - nn from the stage table anyway.
    names = ("fcgf_plan", "fcgf_fwd", "nn", "plan6d")
    if "--inlier-fwd" in sys.argv:
        names = names + ("inlier_fwd",)
    for name in names:
        fn = {"fcgf_plan": fcgf_plan, "fcgf_fwd": fcgf_fwd, "nn": nn_only,
              "plan6d": plan6d, "inlier_fwd": inlier_fwd}[name]
        timed(fn, sub[name], name)


if __name__ == "__main__":
    main()
