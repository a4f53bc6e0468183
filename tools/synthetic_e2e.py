"""End-to-end synthetic chain: self-train FCGF -> train inlier net ->
validate -> benchmark recall (the full reference flow, zero-egress).

The reference proves itself by train -> validate -> benchmark
(core/trainer.py:120-155 + scripts/test_3dmatch.py:87-156) on 3DMatch; this
image has no datasets or pretrained checkpoints, so the same chain runs on the
procedural SyntheticPairDataset:

  A. FCGF self-training (core/fcgf_train.py hardest-contrastive) — the
     reference consumes upstream-pretrained FCGF weights; here the feature
     net must earn its matches first.
  B. Inlier-net training via WeightedProcrustesTrainer (frozen FCGF from A,
     dual pose+BCE loss), validated each epoch with _valid_epoch.
  C. scripts.test_3dmatch.evaluate() over the held-out
     SyntheticTrajectoryDataset using the best-val checkpoint; stats npz in
     the reference schema + a JSON summary.

Run (TPU): python tools/synthetic_e2e.py [--quick] [--out_dir DIR]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="outputs/synthetic_e2e")
    ap.add_argument("--quick", action="store_true",
                    help="tiny budget smoke (CI): few steps, small clouds")
    ap.add_argument("--fcgf_steps", type=int, default=None)
    ap.add_argument("--max_epoch", type=int, default=None)
    ap.add_argument("--iters_per_epoch", type=int, default=None)
    ap.add_argument("--synthetic_points", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--workers", type=int, default=0,
                    help="DataLoader worker processes. Default 0: generation "
                         "is ~0.03 s/pair at 15k points (native radius "
                         "matching), and on a single-core host forked "
                         "workers risk the os.fork-after-JAX deadlock for "
                         "no throughput gain")
    ap.add_argument("--resume_b", default=None,
                    help="resume inlier-net training from this checkpoint")
    ap.add_argument("--skip_a", default=None,
                    help="reuse an existing FCGF checkpoint path")
    ap.add_argument("--skip_b", default=None,
                    help="reuse an existing trained checkpoint path (stage C only)")
    ap.add_argument("--balanced", action="store_true",
                    help="class-balanced inlier BCE (ops/losses.balanced_loss)"
                         ": at rotation-augmented train hit ratios of ~5-15%"
                         " the plain BCE collapses the classifier to "
                         "all-negative (round-4 smoke run: val recall 0.05 at"
                         " epoch 0, 0.002 by epoch 1)")
    ap.add_argument("--profile", choices=["room", "lidar"], default="room",
                    help="room: indoor 3DMatch analogue (5 cm voxels, "
                         "trajectory recall via scripts/test_3dmatch); "
                         "lidar: outdoor KITTI analogue (30 cm voxels, "
                         "conv1=5, TE<0.6m/RE<5deg via scripts/test_kitti)")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO, stream=sys.stdout,
        format="%(asctime)s %(name)s %(message)s", datefmt="%m/%d %H:%M:%S")

    from deepglobalregistration_tpu.utils.platform import (
        enable_compilation_cache, select_platform)

    enable_compilation_cache()
    select_platform()

    import jax
    import jax.numpy as jnp
    import optax

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core import fcgf_train as ft
    from deepglobalregistration_tpu.core.trainer import WeightedProcrustesTrainer
    from deepglobalregistration_tpu.data.factory import make_data_loader
    from deepglobalregistration_tpu.models import load_model
    from deepglobalregistration_tpu.utils import checkpoint as ckpt_utils

    quick = args.quick
    lidar = args.profile == "lidar"
    n_points = args.synthetic_points or (
        4000 if quick else (30000 if lidar else 15000))
    fcgf_steps = args.fcgf_steps if args.fcgf_steps is not None else (
        6 if quick else 1200)
    max_epoch = args.max_epoch if args.max_epoch is not None else (
        1 if quick else 3)
    iters = args.iters_per_epoch if args.iters_per_epoch is not None else (
        2 if quick else 120)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    config = default_config(
        dataset="SyntheticLidarPairDataset" if lidar
        else "SyntheticPairDataset",
        synthetic_points=n_points,
        # Outdoor profile follows the reference KITTI recipe where it differs
        # (scripts/train_kitti.sh: voxel 0.3, conv1=5); success thresholds are
        # the KITTI test constants (scripts/test_kitti.py:33-34).
        voxel_size=0.3 if lidar else 0.05,
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=5 if lidar else 7,
        inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
        inlier_feature_type="ones",
        optimizer="SGD", lr=1e-1, exp_gamma=0.99,
        batch_size=args.batch_size,
        max_epoch=max_epoch, num_train_iter=iters,
        val_epoch_freq=1, val_max_iter=(2 if quick else 16),
        stat_freq=20, test_valid=False,
        out_dir=str(out_dir),
        success_rte_thresh=0.6 if lidar else 0.3,
        success_rre_thresh=5.0 if lidar else 15.0,
        # f1, not succ_rate: the weighted-Procrustes success saturates within
        # an epoch (it is weight-SCALE invariant), which froze best-val at
        # epoch 0 while the classifier — whose absolute sigmoid mass drives
        # the pipeline's weighted-sum safeguard gate — was still all-negative.
        best_val_metric="f1",
        use_balanced_loss=args.balanced,
        # dense kmap fast path (hash layouts OOM). Lidar views span +-45 m of
        # ego xy at 0.3 m cells (300) + terrain/buildings ~15 m of z.
        dense_extent="384,384,128" if lidar else "256,256,256",
        # Rooms are ~3x denser per voxel than the bench cloud: exact 6D maps
        # need wider edge budgets (tools/degree_probe.py --room).
        edge_budget_scale=2.5,
        # The lidar profile trains at the 32768 voxel bucket where the
        # full-tape inlier step needs ~16.3 GB (>15.75 GB HBM on v5e);
        # rematerializing the 6D net's forward trades ~1 extra forward for
        # fitting batch 2 (core/train_step.py remat path).
        remat=lidar,
        bf16=True)
    dense_extent = tuple(int(x) for x in config.dense_extent.split(","))

    summary = {"n_points": n_points, "fcgf_steps": fcgf_steps,
               "max_epoch": max_epoch, "iters_per_epoch": iters}

    # ---------------------------------------------------------------- A
    fcgf_ckpt = args.skip_a
    if fcgf_ckpt is None:
        print(f"[A] FCGF self-training: {fcgf_steps} steps "
              f"({n_points} pts/cloud)", flush=True)
        spec = load_model(config.feat_model)
        fcgf_cfg = spec.make_config(
            1, config.feat_model_n_out, bn_momentum=config.bn_momentum,
            conv1_kernel_size=config.feat_conv1_kernel_size,
            normalize_feature=True, D=3)
        params, state = spec.init(jax.random.PRNGKey(0), fcgf_cfg)
        opt = optax.adam(optax.exponential_decay(1e-3, fcgf_steps, 0.3))
        opt_state = opt.init(params)
        loss_cfg = ft.FCGFLossConfig(
            num_pos=256 if quick else 1024, num_neg=256 if quick else 1024,
            neg_radius=2 * config.voxel_size)
        step, _ = ft.make_fcgf_train_step(spec, fcgf_cfg, loss_cfg, opt,
                                          level_shrink=config.level_shrink,
                                          dense_extent=dense_extent)
        step = jax.jit(step, donate_argnums=(0, 1, 2))

        # Matching-quality probe: the number that gates the whole downstream
        # chain is the 1-NN hit ratio (fraction of feature matches landing
        # within the GT search radius) — round 3 trained blind on the loss and
        # shipped features with <1% hits. Fixed val batch, jitted eval.
        from deepglobalregistration_tpu.ops.knn import find_nn
        from deepglobalregistration_tpu.ops.sparse_grid import Grid

        val_loader = make_data_loader(config, "val", config.batch_size,
                                      num_workers=0)
        probe_batch = next(iter(val_loader))["pair_batch"]
        radius = config.voxel_size * \
            config.positive_pair_search_voxel_size_multiplier

        @jax.jit
        def hit_probe(params, state, batch):
            b, n = batch.xyz0.shape[:2]
            grids = Grid(
                coords=jnp.concatenate([batch.coords0, batch.coords1], 0),
                num=jnp.concatenate([batch.num0, batch.num1], 0))
            plan = jax.vmap(spec.build_plan,
                            in_axes=(0, None, None, None, None))(
                grids, fcgf_cfg, config.level_shrink, dense_extent, True)
            feats, _ = spec.apply(params, state, fcgf_cfg, plan,
                                  jnp.ones((2 * b, n, 1), jnp.float32),
                                  train=False)
            feats = feats.astype(jnp.float32)
            idx, _ = jax.vmap(find_nn)(feats[:b], feats[b:],
                                       batch.num0, batch.num1)
            x0in1 = jnp.einsum("bij,bnj->bni", batch.T_gt[:, :3, :3],
                               batch.xyz0) + batch.T_gt[:, None, :3, 3]
            d = jnp.linalg.norm(
                x0in1 - jnp.take_along_axis(batch.xyz1, idx[..., None],
                                            axis=1), axis=-1)
            valid = jnp.arange(n)[None, :] < batch.num0[:, None]
            return jnp.sum((d < radius) & valid) / jnp.maximum(
                jnp.sum(valid), 1)

        loader = make_data_loader(config, "train", config.batch_size,
                                  num_workers=args.workers)
        it = iter(loader)
        key = jax.random.PRNGKey(42)
        t0 = time.time()
        for i in range(fcgf_steps):
            batch = next(it)["pair_batch"]
            key, sub = jax.random.split(key)
            params, state, opt_state, stats = step(params, state, opt_state,
                                                   sub, batch)
            if i % 20 == 0 or i == fcgf_steps - 1:
                hit = float(hit_probe(params, state, probe_batch)) \
                    if (i % 100 == 0 or i == fcgf_steps - 1) else None
                print(f"[A] step {i}: loss {float(stats['loss']):.4f} "
                      f"pos {float(stats['pos_loss']):.4f} "
                      f"neg {float(stats['neg_loss']):.4f}"
                      + (f" val_hit {hit:.3f}" if hit is not None else "")
                      + f" ({time.time() - t0:.0f}s)", flush=True)
        summary["fcgf_final_loss"] = float(stats["loss"])
        summary["fcgf_val_hit_ratio"] = float(
            hit_probe(params, state, probe_batch))
        fcgf_ckpt = str(out_dir / "fcgf_selftrained.pkl")
        ckpt_utils.save_checkpoint(fcgf_ckpt, epoch=0, params=params,
                                   state=state)
        print(f"[A] saved {fcgf_ckpt}", flush=True)

    # ---------------------------------------------------------------- B
    best_ckpt = args.skip_b
    if best_ckpt is None:
        print(f"[B] inlier-net training: {max_epoch} epochs x {iters} iters",
              flush=True)
        config.weights = fcgf_ckpt
        if args.resume_b:
            config.resume = args.resume_b
        train_loader = make_data_loader(config, "train", config.batch_size,
                                        num_workers=args.workers)
        val_loader = make_data_loader(config, "val", config.batch_size,
                                      num_workers=0)
        trainer = WeightedProcrustesTrainer(config, train_loader, val_loader)
        trainer.train()
        best = Path(config.out_dir) / "best_val_checkpoint.pkl"
        best_ckpt = str(best if best.exists()
                        else Path(config.out_dir) / "checkpoint.pkl")
        summary["best_val"] = trainer.best_val
        summary["best_val_epoch"] = trainer.best_val_epoch
        print(f"[B] best ckpt {best_ckpt} ({trainer.best_val_metric} "
              f"{trainer.best_val:.4f})", flush=True)

    # ---------------------------------------------------------------- C
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration

    config.weights = best_ckpt
    dgr = DeepGlobalRegistration(config)
    if lidar:
        print("[C] KITTI-analogue benchmark on held-out lidar pairs",
              flush=True)
        from scripts.test_kitti import evaluate as evaluate_kitti

        loader = make_data_loader(config, "test", batch_size=1,
                                  num_workers=0, shuffle=False)
        if quick:
            loader.dataset.files = loader.dataset.files[:2]
        s = evaluate_kitti(config, loader, dgr)
        stats_name = "kitti-stats.npz"
    else:
        print("[C] benchmark on held-out synthetic trajectories", flush=True)
        import torch.utils.data

        from deepglobalregistration_tpu.data.synthetic import (
            SyntheticTrajectoryDataset)
        from scripts.test_3dmatch import evaluate

        dset = SyntheticTrajectoryDataset(
            n_points=n_points,
            n_scenes=2 if quick else 4,
            pairs_per_scene=1 if quick else 8)
        loader = torch.utils.data.DataLoader(dset, batch_size=1,
                                             shuffle=False, num_workers=0,
                                             collate_fn=lambda x: x)
        s = evaluate([dgr], ["DGR-TPU-synthetic"], loader, config)[0]
        stats_name = "3dmatch-stats.npz"
    succ = s[:, 0]
    summary.update(
        recall=float(succ.mean()),
        te=float(s[succ > 0, 1].mean()) if succ.any() else None,
        re=float(s[succ > 0, 2].mean()) if succ.any() else None,
        mean_time_s=float(s[:, 3].mean()),
        n_pairs=int(s.shape[0]),
        stats_npz=str(Path(config.out_dir) / stats_name))
    with open(out_dir / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print("[C] summary:", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
