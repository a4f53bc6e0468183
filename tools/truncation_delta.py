"""Quantify the 6D level-3 cap truncation on the bench config (VERDICT r2 #2).

The paired/edge 6D plan drops edges beyond static caps at the deepest pyramid
level (tools/degree_probe.py: level-3 multiplicity max ~121 vs b_slots 64,
self-degree max ~156 vs d_cap 64; levels 0-2 are exact). This tool measures
what that truncation does to the inlier net's OUTPUT on real bench pairs: it
builds the same 6D correspondence grid twice —

  (a) the production edge-compacted plan (models/unet_plan.EDGE_CONV_6D=True),
  (b) the exact dense plan (EDGE_CONV_6D=False: full [729, M] kernel maps via
      paired level-0 lookups + generic 6D hash tables, no caps)

— runs the identical inlier net on both (f32 compute so the difference is
attributable to dropped edges, not bf16 accumulation), and reports logit /
clipped-weight / weighted-sum deltas. The reference computes exact maps by
construction (MinkowskiEngine variable-length kernel maps; model usage
/root/reference/model/resunet.py:598-649).

Usage: python tools/truncation_delta.py [--seeds 2] [--json docs/...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    from deepglobalregistration_tpu.utils.platform import (
        enable_compilation_cache, select_platform)

    enable_compilation_cache()
    select_platform()

    import jax
    import jax.numpy as jnp

    from demo import synthetic_pair

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import (
        DeepGlobalRegistration, _bucket_for)
    from deepglobalregistration_tpu.models import unet_plan as up
    from deepglobalregistration_tpu.ops.sparse_grid import Grid

    # f32 compute isolates the truncation effect (bf16 reorders accumulation).
    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7, inlier_model="ResUNetBN2C",
        inlier_conv1_kernel_size=3, voxel_size=0.05,
        inlier_feature_type="ones", dense_extent="256,256,256", bf16=False)
    dgr = DeepGlobalRegistration(config)
    spec, cfg = dgr.inlier_spec, dgr.inlier_cfg
    params, state = dgr.inlier_params, dgr.inlier_state

    def run(c0, c1, num, cap, edge: bool):
        prev = up.EDGE_CONV_6D
        up.EDGE_CONV_6D = edge
        try:
            @jax.jit
            def go(c0, c1, num, feats):
                plan = up.build_paired_unet_plan(
                    c0, c1, num, cfg.conv1_kernel_size, cfg.region_type,
                    cfg.levels, dgr.level_shrink_6d,
                    dense_extent=dgr.dense_extent if edge else None)
                plan = jax.tree.map(lambda x: x[None], plan)
                logits, _ = spec.apply(params, state, cfg, plan, feats[None],
                                       train=False)
                return logits[0, :, 0], jnp.any(plan.overflow)

            feats = jnp.ones((cap, 1), jnp.float32)
            return go(jnp.asarray(c0), jnp.asarray(c1),
                      jnp.int32(num), feats)
        finally:
            up.EDGE_CONV_6D = prev

    rows = []
    for seed in range(args.seeds):
        xyz0, xyz1, _ = synthetic_pair(n=args.n, seed=seed)
        _, coords0, _ = dgr.preprocess(xyz0)
        _, coords1, _ = dgr.preprocess(xyz1)
        f0 = dgr.fcgf_feature_extraction(None, coords0)
        f1 = dgr.fcgf_feature_extraction(None, coords1)
        _, idx1 = dgr.fcgf_feature_matching(f0, f1)
        n = len(coords0)
        cap = _bucket_for(n, dgr.buckets)
        pad = np.full((cap, 3), 32766, np.int32)
        c0 = pad.copy()
        c0[:n] = coords0
        c1 = pad.copy()
        c1[:n] = coords1[np.asarray(idx1)]

        la, ova = run(c0, c1, n, cap, edge=True)
        lb, ovb = run(c0, c1, n, cap, edge=False)
        la = np.asarray(la[:n], np.float64)
        lb = np.asarray(lb[:n], np.float64)
        wa = 1 / (1 + np.exp(-la))
        wb = 1 / (1 + np.exp(-lb))
        thr = dgr.clip_weight_thresh
        wa = np.where(wa < thr, 0.0, wa)
        wb = np.where(wb < thr, 0.0, wb)
        rows.append({
            "seed": seed, "rows": n,
            "overflow_edge": bool(ova), "overflow_exact": bool(ovb),
            "logit_max_abs_delta": float(np.abs(la - lb).max()),
            "logit_mean_abs_delta": float(np.abs(la - lb).mean()),
            "weight_max_abs_delta": float(np.abs(wa - wb).max()),
            "clip_flips": int(np.sum((wa == 0) != (wb == 0))),
            "wsum_edge": float(wa.sum()), "wsum_exact": float(wb.sum()),
            "logit_range_exact": [float(lb.min()), float(lb.max())],
        })
        print(json.dumps(rows[-1]))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
