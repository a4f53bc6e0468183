#!/usr/bin/env python
"""Multi-chip eval fan-out scaling probe (virtual CPU mesh).

VERDICT r4 #7: register_batch(mesh=...) is correctness-tested but its
throughput scaling was never characterized. This measures pairs/s of the
mesh-sharded vmapped path at n_devices in {1, 2, 4, 8} on the virtual CPU
mesh (xla_force_host_platform_device_count) at small shapes. CPU absolute
rates mean nothing for TPU; the SCALING CURVE (work per device fixed, batch
= 2 * n_devices) is the quantity of interest — ideal is flat time as
devices and batch grow together, i.e. pairs/s proportional to n_devices.

Run:  python tools/fanout_probe.py [--points 3000] [--per_device 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DEVICES = (1, 2, 4, 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=3000)
    ap.add_argument("--per_device", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + f" --xla_force_host_platform_device_count="
                        f"{max(N_DEVICES)}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
    from deepglobalregistration_tpu.parallel.data_parallel import make_mesh
    from demo import synthetic_pair

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7, inlier_model="ResUNetBN2C",
        inlier_conv1_kernel_size=3, voxel_size=0.05,
        inlier_feature_type="ones", dense_extent="256,256,256", bf16=False)
    dgr = DeepGlobalRegistration(config)

    pairs = [synthetic_pair(n=args.points, seed=s) for s in range(8)]
    results = {}
    for nd in N_DEVICES:
        mesh = make_mesh(nd)
        b = nd * args.per_device
        xs = [pairs[i % len(pairs)][0] for i in range(b)]
        ys = [pairs[i % len(pairs)][1] for i in range(b)]
        dgr.register_batch(xs, ys, mesh=mesh)  # compile + warm
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = dgr.register_batch(xs, ys, mesh=mesh)
            best = min(best, time.perf_counter() - t0)
        results[nd] = {"batch": b, "sec": round(best, 3),
                       "pairs_per_sec": round(b / best, 3)}
        print(f"n_devices={nd}: batch {b} in {best:.3f}s "
              f"({b / best:.2f} pairs/s)", flush=True)

    base = results[1]["pairs_per_sec"]
    for nd in N_DEVICES:
        results[nd]["speedup_vs_1dev"] = round(
            results[nd]["pairs_per_sec"] / base, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
