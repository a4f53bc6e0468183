"""Drive ONE full-scale inlier-net training step on the real TPU.

Exercises the streaming edge-conv backward (ops/edge_conv._conv_gather_bwd /
_conv_scatter_bwd) at the exact shape that OOMed the generic-VJP backward
(batch 2, 15k-point synthetic rooms, edge_budget_scale 2.5: one
[M_pad, D, Cout] broadcast wanted 15 GB of the 16 GB HBM). Prints the compile
time, per-step time, and the loss/grad-finite stats.

Run (TPU, never under shell timeout):
    nohup python tools/train_step_drive.py [--batch 2] [--points 15000] &
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--points", type=int, default=15000)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.trainer import (
        WeightedProcrustesTrainer)
    from deepglobalregistration_tpu.data.factory import make_data_loader

    config = default_config(
        dataset="SyntheticPairDataset",
        synthetic_points=args.points,
        voxel_size=0.05,
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7,
        inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
        inlier_feature_type="ones",
        optimizer="SGD", lr=1e-1, exp_gamma=0.99,
        batch_size=args.batch,
        max_epoch=1, num_train_iter=args.steps,
        val_epoch_freq=-1, stat_freq=1, test_valid=False,
        out_dir="outputs/train_step_drive",
        dense_extent="256,256,256", edge_budget_scale=2.5, bf16=True)

    train_loader = make_data_loader(config, "train", config.batch_size,
                                    num_workers=2)
    # no val loader: the public train() entry then runs exactly one training
    # epoch of num_train_iter steps (plus its checkpoint save)
    trainer = WeightedProcrustesTrainer(config, train_loader, None)
    t0 = time.time()
    trainer.train()
    jax.block_until_ready(trainer.inlier_params)
    print(f"epoch ({args.steps} steps incl. compile): "
          f"{time.time() - t0:.1f}s", flush=True)
    import numpy as np
    finite = all(np.isfinite(np.asarray(p)).all()
                 for p in jax.tree.leaves(trainer.inlier_params))
    print("DRIVE OK" if finite else "DRIVE FAILED: non-finite params",
          flush=True)


if __name__ == "__main__":
    main()
