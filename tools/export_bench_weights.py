"""Export a small feature-only (FCGF) checkpoint for the benchmark.

The reference benchmarks with TRAINED weights (README.md:41-67 downloads a
pretrained .pth before scripts/test_3dmatch.py); bench.py historically ran
random weights, which maximizes the data-dependent iteration counts of the
refinement loop and ICP (random inits need 18-30 o3d ICP iterations vs ~5
from a good init — STATUS.md wall analysis). This tool extracts JUST the
FCGF tree from an e2e-chain checkpoint (tools/synthetic_e2e.py stage A),
stores it bf16 + deflated (a few MB — committable, unlike the ~400 MB 6D
inlier tree), and stamps the network config the pipeline needs to
reconstruct the model (core/pipeline.py:112-156).

Usage: python tools/export_bench_weights.py \
           --ckpt outputs/synthetic_e2e_r04/fcgf_selftrained.pkl \
           --out weights/fcgf_synthetic.pkl
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="weights/fcgf_synthetic.pkl")
    ap.add_argument("--feat_model", default="ResUNetBN2C")
    ap.add_argument("--feat_model_n_out", type=int, default=32)
    ap.add_argument("--feat_conv1_kernel_size", type=int, default=7)
    ap.add_argument("--voxel_size", type=float, default=0.05)
    ap.add_argument("--inlier_model", default="ResUNetBN2C")
    ap.add_argument("--inlier_conv1_kernel_size", type=int, default=3)
    args = ap.parse_args()

    from deepglobalregistration_tpu.utils import checkpoint as ckpt_utils

    state = ckpt_utils.load_checkpoint(args.ckpt)
    sd = state["state_dict"]
    config = {
        "voxel_size": args.voxel_size,
        "inlier_feature_type": "ones",
        "feat_model": args.feat_model,
        "feat_model_n_out": args.feat_model_n_out,
        "feat_conv1_kernel_size": args.feat_conv1_kernel_size,
        "inlier_model": args.inlier_model,
        "inlier_conv1_kernel_size": args.inlier_conv1_kernel_size,
        "bn_momentum": 0.05,
        "normalize_feature": True,
    }
    ckpt_utils.save_checkpoint(
        args.out, epoch=state.get("epoch", 0), params=sd["params"],
        state=sd["state"], config=config, dtype="bf16", compress=True)
    print(f"wrote {args.out}: {Path(args.out).stat().st_size / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
