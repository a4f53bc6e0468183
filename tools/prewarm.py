"""Pre-warm the persistent compilation cache for the benchmark buckets.

First compile of the fused register() program is minutes on this platform
(STATUS.md open item); every entry point already persists compiles to
``jax_compilation_cache_dir`` (utils/platform.enable_compilation_cache), so
one warm pass makes every later cold process ready-to-measure in seconds.
This tool is that warm pass, as one committed command:

    python tools/prewarm.py [--batch 4] [--points 30000]

It compiles, for the flagship 3DMatch-scale config:
  - the voxelize program at the raw bucket,
  - the fused register() program at the voxel bucket (both the speculative
    and exact paths share one executable),
  - optionally the register_batch program at --batch (0 skips it).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepglobalregistration_tpu.utils.platform import (
    enable_compilation_cache, select_platform)

enable_compilation_cache()
select_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=4,
                    help="also warm register_batch at this size (0 = skip)")
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
    xyz0, xyz1, _ = synthetic_pair(n=args.points, seed=0)

    t0 = time.time()
    dgr.register(xyz0, xyz1)
    print(f"register() warm: {time.time() - t0:.0f}s", flush=True)

    if args.batch:
        t0 = time.time()
        dgr.register_batch([xyz0] * args.batch, [xyz1] * args.batch,
                           force_vmapped=True)
        print(f"register_batch(B={args.batch}, vmapped) warm: "
              f"{time.time() - t0:.0f}s", flush=True)
    print("compilation cache warmed", flush=True)


if __name__ == "__main__":
    main()
