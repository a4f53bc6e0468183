#!/usr/bin/env python
"""Measure register() cold-start latency: fused vs --split_register, cold vs
warm persistent cache (VERDICT r3 #7: "cut cold compile below ~2 min or prove
it's warm in practice").

The fused single-dispatch program is the throughput configuration but its
first compile measured 414 s on this platform (BENCH_r03 tail). The staged
path compiles four much smaller programs. This tool times, for one mode:

  - session init -> first register() return (compile + first pair)
  - second register() (steady state)

Run on the real TPU, one mode per process (compile caches are process-global):

    nohup python tools/compile_probe.py --mode fused --cache warm &
    nohup python tools/compile_probe.py --mode split --cache fresh &

--cache fresh points the persistent cache at a throwaway dir (true cold
compile); warm uses ~/.jax_cache (the path every entry point shares).
NEVER run under a shell timeout (tunnel death, see .claude/skills/verify).
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fused", "split"], default="fused")
    ap.add_argument("--cache", choices=["fresh", "warm"], default="warm")
    ap.add_argument("--points", type=int, default=30000)
    args = ap.parse_args()

    t_init0 = time.time()
    import jax

    cache_dir = tempfile.mkdtemp(prefix="jaxcache_probe_") \
        if args.cache == "fresh" else str(Path.home() / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepglobalregistration_tpu.utils.platform import select_platform

    select_platform()

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
    from demo import synthetic_pair

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7,
        inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        dense_extent="256,256,256", bf16=True,
        split_register=(args.mode == "split"))
    dgr = DeepGlobalRegistration(config)
    xyz0, xyz1, _ = synthetic_pair(n=args.points, seed=0)
    init_s = time.time() - t_init0

    t0 = time.time()
    dgr.register(xyz0, xyz1)
    first_s = time.time() - t0

    t0 = time.time()
    dgr.register(xyz0, xyz1)
    second_s = time.time() - t0

    print(json.dumps({
        "mode": args.mode, "cache": args.cache,
        "platform": jax.devices()[0].platform,
        "init_s": round(init_s, 1),
        "first_pair_s": round(first_s, 1),
        "second_pair_s": round(second_s, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
