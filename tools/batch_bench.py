"""Measure batched-serving throughput: register_batch(B) vs the stream path.

VERDICT r2 #6: publish a batched pairs/s number (B=8) next to the stream
number, at equal results. The batched program computes the learned-refinement
answer + gate bit per pair and reruns gate failures sequentially
(core/pipeline.register_batch two-pass structure), so results match
register() on every gate-passing pair by construction; this tool also
cross-checks the transforms.

Run on the real TPU (nohup, never under a shell timeout):
    nohup python tools/batch_bench.py [--batch 8] [--reps 4] &
"""

import argparse
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--check_vs_register", type=int, default=1)
    args = ap.parse_args()

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
    from demo import synthetic_pair

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
        inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        dense_extent="256,256,256", bf16=True)
    dgr = DeepGlobalRegistration(config)

    pairs = [synthetic_pair(n=args.points, seed=s) for s in range(args.batch)]
    xyz0s = [p[0] for p in pairs]
    xyz1s = [p[1] for p in pairs]

    t0 = time.time()
    T_batch = dgr.register_batch(xyz0s, xyz1s, force_vmapped=True)
    print(f"compile+first vmapped batch: {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    for _ in range(args.reps):
        T_batch = dgr.register_batch(xyz0s, xyz1s, force_vmapped=True)
    vmapped_dt = (time.time() - t0) / (args.reps * args.batch)

    # Default single-chip register_batch path (routes through the pipelined
    # stream): warm once, then measure.
    dgr.register_batch(xyz0s, xyz1s)
    t0 = time.time()
    for _ in range(args.reps):
        T_stream = dgr.register_batch(xyz0s, xyz1s)
    stream_dt = (time.time() - t0) / (args.reps * args.batch)

    out = {
        "metric": f"register_batch(B={args.batch}) pairs/sec (single chip)",
        "value": round(1.0 / stream_dt, 3),
        "unit": "pairs/s",
        "sec_per_pair": round(stream_dt, 4),
        "batch": args.batch,
        "vmapped_single_program_pairs_per_sec": round(1.0 / vmapped_dt, 3),
        "note": "default register_batch routes through the pipelined stream "
                "(exact register() parity); the vmapped single-program path "
                "serves the multi-chip mesh fan-out",
    }

    if args.check_vs_register:
        # warm + compare against the sequential answer on 2 pairs
        errs = []
        for i in range(min(2, args.batch)):
            T_seq = dgr.register(xyz0s[i], xyz1s[i])
            # compare rotations/translations (both paths refine + ICP-polish)
            dR = np.rad2deg(np.arccos(np.clip(
                (np.trace(T_batch[i][:3, :3].T @ T_seq[:3, :3]) - 1) / 2,
                -1, 1)))
            dt = np.linalg.norm(T_batch[i][:3, 3] - T_seq[:3, 3])
            errs.append((float(dR), float(dt)))
        out["vs_register_maxdiff"] = {
            "rot_deg": max(e[0] for e in errs),
            "trans_m": max(e[1] for e in errs)}

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
