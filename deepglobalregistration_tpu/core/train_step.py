"""The WeightedProcrustes training step — pure function, shard-ready.

Rebuilds the inner loop of core/trainer.py:157-351 as one jitted step:

  frozen FCGF features on both clouds -> per-pair 1-NN correspondences ->
  GT correctness labels -> batched 6D inlier net (train-mode BN over the whole
  batch, like ME's batched sparse tensor) -> per-pair weighted Procrustes ->
  pose loss (rotation + trans_weight * translation over pairs with weight-sum
  > 10; trainer.py:240-251) + direct BCE inlier loss (trainer.py:258-262) ->
  gradients w.r.t. the inlier net only (trainer.py:105-108: the optimizer holds
  inlier params only) -> torch-semantics SGD/Adam update with NaN-grad guard
  (trainer.py:286-293).

Data parallelism: the step is written over a leading pair-batch axis; under
jax.jit with a NamedSharding over that axis, XLA inserts the gradient psum and
cross-device BatchNorm reductions automatically (SURVEY.md section 2.3).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import knn, losses, metrics, procrustes
from ..ops.sparse_grid import Grid
from . import correspondence


class PairBatch(NamedTuple):
    """A padded batch of registration pairs (leading axis = pairs)."""

    xyz0: jnp.ndarray  # [B, N, 3] selected points per voxel
    xyz1: jnp.ndarray
    coords0: jnp.ndarray  # [B, N, 3] int32 voxel coords
    coords1: jnp.ndarray
    num0: jnp.ndarray  # [B]
    num1: jnp.ndarray
    pos_pairs: jnp.ndarray  # [B, P, 2] int32 GT correspondence index pairs
    pos_num: jnp.ndarray  # [B]
    T_gt: jnp.ndarray  # [B, 4, 4]


def torch_sgd(lr, momentum: float = 0.9, dampening: float = 0.1,
              weight_decay: float = 1e-4):
    """optax transform with torch.optim.SGD semantics:
    g' = g + wd * p;  buf = momentum * buf + (1 - dampening) * g';  update = -lr * buf.
    """

    def init(params):
        return {"momentum": jax.tree.map(jnp.zeros_like, params), "step": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        step = state["step"]
        lr_t = lr(step) if callable(lr) else lr
        g = jax.tree.map(lambda gg, p: gg + weight_decay * p, grads, params)
        first = step == 0
        buf = jax.tree.map(
            lambda b, gg: jnp.where(first, gg, momentum * b + (1 - dampening) * gg),
            state["momentum"], g)
        updates = jax.tree.map(lambda b: -lr_t * b, buf)
        return updates, {"momentum": buf, "step": step + 1}

    return optax.GradientTransformation(init, update)


def make_optimizer(name: str, lr_schedule, config) -> optax.GradientTransformation:
    """SGD (torch semantics) or Adam, matching trainer.py:92-108 / config.py:85-98."""
    if name == "SGD":
        return torch_sgd(lr_schedule, momentum=config.sgd_momentum,
                         dampening=config.sgd_dampening, weight_decay=config.weight_decay)
    if name == "Adam":
        return optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_adam(b1=config.adam_beta1, b2=config.adam_beta2),
            optax.scale_by_learning_rate(lr_schedule))
    raise ValueError(f"optimizer {name} not supported")


def generate_inlier_input(fcgf_apply, fcgf_params, fcgf_state, fcgf_cfg,
                          batch: PairBatch, inlier_feature_type: str,
                          inlier_knn: int = 1, level_shrink: int = 2,
                          dense_extent=None):
    """Frozen FCGF forward + per-pair matching + 6D input assembly
    (trainer.py:630-658 generate_inlier_input / find_pairs).

    inlier_knn > 1 emits k correspondences per cloud-0 point (config
    --inlier_knn; trainer find_pairs knn argument), flattened into the
    correspondence axis.

    dense_extent: static 3D cell box enabling the dense-index kernel-map fast
    path (see ops/dense_grid.py) — without it the hash-probe gathers' TPU
    layouts pad a [E, 8, 3] u32 row buffer ~20x and the step OOMs at
    3DMatch-scale conv1=7 maps.
    """
    b, n = batch.xyz0.shape[:2]
    # Stack both clouds of every pair into one 2B "ME batch" for the feature net.
    grids = Grid(coords=jnp.concatenate([batch.coords0, batch.coords1], 0),
                 num=jnp.concatenate([batch.num0, batch.num1], 0))
    plan = jax.vmap(fcgf_apply.build_plan, in_axes=(0, None, None, None, None))(
        grids, fcgf_cfg, level_shrink, dense_extent, True)
    feats_in = jnp.ones((2 * b, n, 1), jnp.float32)
    feats, _ = fcgf_apply.apply(fcgf_params, fcgf_state, fcgf_cfg, plan, feats_in,
                                train=False)
    feats = jax.lax.stop_gradient(feats)  # frozen FCGF (trainer.py:160-162)
    f0, f1 = feats[:b], feats[b:]

    if inlier_knn > 1:
        knn_idx, _ = jax.vmap(knn.find_knn, in_axes=(0, 0, 0, 0, None))(
            f0, f1, batch.num0, batch.num1, inlier_knn)  # [B, N, k]
        k = inlier_knn
        # flatten to [B, N*k] correspondences; replicate the batch views so the
        # downstream code is k-agnostic
        nn_idx = knn_idx.reshape(b, n * k)
        rep = lambda x: jnp.repeat(x, k, axis=1)
        batch = batch._replace(
            xyz0=rep(batch.xyz0), coords0=rep(batch.coords0),
            num0=batch.num0 * k)
        f0 = rep(f0)
        n = n * k
    else:
        nn_idx, _ = knn.find_nn_batch(f0, f1, batch.num0, batch.num1)  # [B, N]
    coords6 = jnp.concatenate([batch.coords0,
                               jnp.take_along_axis(batch.coords1, nn_idx[..., None], 1)], -1)
    if inlier_feature_type == "ones":
        ifeats = jnp.ones((b, n, 1), jnp.float32)
    elif inlier_feature_type == "feats":
        ifeats = jnp.concatenate(
            [f0, jnp.take_along_axis(f1, nn_idx[..., None], 1)], -1)
    elif inlier_feature_type == "coords":
        ifeats = jnp.concatenate(
            [jnp.cos(batch.xyz0),
             jnp.cos(jnp.take_along_axis(batch.xyz1, nn_idx[..., None], 1))], -1)
    else:
        raise TypeError(f"undefined inlier feature type {inlier_feature_type}")

    # predicted pair (source point index, matched index); with inlier_knn > 1
    # the source index is the ORIGINAL point id i = row // k (reference
    # find_pairs emits (i, nn_j) per neighbor).
    src_idx = jnp.arange(n, dtype=jnp.int32) // max(inlier_knn, 1)
    pred_pairs = jnp.concatenate(
        [jnp.broadcast_to(src_idx[None, :, None], (b, n, 1)),
         nn_idx[..., None].astype(jnp.int32)], -1)
    is_correct = jax.vmap(correspondence.find_correct_correspondence)(
        batch.pos_pairs, batch.pos_num, pred_pairs, batch.num0)
    return coords6, ifeats, nn_idx, is_correct, batch


def make_train_step(fcgf_spec, fcgf_cfg, inlier_spec, inlier_cfg, config,
                    optimizer: optax.GradientTransformation):
    """Build the jitted train step closure. Returns step(params, state, opt_state,
    fcgf_params, fcgf_state, batch) -> (params, state, opt_state, stats)."""

    clip_thresh = config.clip_weight_thresh
    trans_weight = config.trans_weight
    procrustes_w = config.procrustes_loss_weight
    direct_w = config.inlier_direct_loss_weight
    use_direct = config.inlier_use_direct_loss
    balanced = config.use_balanced_loss
    level_shrink = int(getattr(config, "level_shrink", 2))
    de = str(getattr(config, "dense_extent", "") or "")
    dense_extent = tuple(int(x) for x in de.split(",")) if de else None

    def loss_fn(inlier_params, inlier_state, fcgf_params, fcgf_state, batch: PairBatch):
        b, n = batch.xyz0.shape[:2]
        coords6, ifeats, nn_idx, is_correct, batch = generate_inlier_input(
            fcgf_spec, fcgf_params, fcgf_state, fcgf_cfg, batch,
            config.inlier_feature_type, inlier_knn=getattr(config, "inlier_knn", 1),
            level_shrink=level_shrink, dense_extent=dense_extent)
        b, n = batch.xyz0.shape[:2]

        grid6 = Grid(coords=coords6, num=batch.num0)
        # the paired fast path needs unique c0 per row: only valid for 1-NN
        if (getattr(config, "inlier_knn", 1) == 1
                and hasattr(inlier_cfg, "family")
                and not inlier_cfg.family.startswith("sp")):
            # paired 6D fast path (see core/pipeline.py inlier stage)
            from ..models import unet_plan as up

            plan6 = jax.vmap(up.build_paired_unet_plan,
                             in_axes=(0, 0, 0, None, None, None, None, None,
                                      None))(
                coords6[..., :3], coords6[..., 3:], batch.num0,
                inlier_cfg.conv1_kernel_size, inlier_cfg.region_type,
                inlier_cfg.levels,
                int(getattr(config, "level_shrink_6d", 1)), dense_extent,
                float(getattr(config, "edge_budget_scale", 1.0) or 1.0))
        else:
            plan6 = jax.vmap(inlier_spec.build_plan, in_axes=(0, None))(grid6, inlier_cfg)
        apply_fn = inlier_spec.apply
        if getattr(config, "remat", False):
            # trade backward-pass memory for one forward recompute
            # (jax.checkpoint over the whole inlier net); the frozen FCGF
            # needs no remat — stop_gradient already discards its tape
            apply_fn = jax.checkpoint(inlier_spec.apply,
                                      static_argnums=(2, 5))
        logits, new_state = apply_fn(inlier_params, inlier_state, inlier_cfg,
                                     plan6, ifeats, True)
        logits = logits[..., 0]  # [B, N]
        valid = jnp.arange(n, dtype=jnp.int32)[None, :] < batch.num0[:, None]

        weights = jax.nn.sigmoid(logits)
        if clip_thresh > 0:
            weights = weights * (weights > clip_thresh)  # non-inplace clip (trainer.py:227-231)
        weights = weights * valid

        xyz1_nn = jnp.take_along_axis(batch.xyz1, nn_idx[..., None], 1)
        R, t = procrustes.weighted_procrustes_batch(batch.xyz0, xyz1_nn, weights)

        ws = jnp.sum(weights, axis=1)
        pair_valid = ws > 10.0  # trainer.py:246 weight-sum gate
        R_gt = batch.T_gt[:, :3, :3]
        t_gt = batch.T_gt[:, :3, 3]
        rot_err = metrics.batch_rotation_error(R, R_gt)
        trans_err = metrics.batch_translation_error(t, t_gt)
        pose_each = rot_err + trans_weight * trans_err
        n_valid = jnp.maximum(jnp.sum(pair_valid.astype(jnp.float32)), 1.0)
        pose_loss = jnp.sum(jnp.where(pair_valid, pose_each, 0.0)) / n_valid

        labels = is_correct.astype(jnp.float32)
        if balanced:
            inlier_loss = losses.balanced_loss(logits, labels, valid)
        else:
            inlier_loss = losses.unbalanced_loss(logits, labels, valid)

        loss = procrustes_w * pose_loss
        if use_direct:
            loss = loss + direct_w * inlier_loss
        stats = {"loss": loss, "pose_loss": pose_loss, "inlier_loss": inlier_loss,
                 "rot_err_deg": jnp.rad2deg(jnp.mean(rot_err)),
                 "trans_err": jnp.mean(trans_err),
                 "valid_pairs": jnp.sum(pair_valid.astype(jnp.int32)),
                 "logits": logits, "labels": labels, "valid": valid,
                 "R": R, "t": t}
        return loss, (new_state, stats)

    def step(inlier_params, inlier_state, opt_state, fcgf_params, fcgf_state,
             batch: PairBatch, lr=None):
        """One update. `lr`, when given, is a TRACED scalar multiplying the
        optimizer's unit-LR updates — this is how the per-epoch ExponentialLR
        reaches the compiled step without retracing (a Python closure would be
        baked in as a constant at trace time). Torch semantics are preserved:
        SGD's momentum buffer is LR-free and Adam's moments are LR-free, so
        late LR scaling is exact."""
        (loss, (new_state, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            inlier_params, inlier_state, fcgf_params, fcgf_state, batch)
        # NaN/Inf-grad guard: skip the update entirely (trainer.py:286-293).
        finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(g))
                                    for g in jax.tree.leaves(grads)]))
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, new_opt = optimizer.update(grads, opt_state, inlier_params)
        if lr is not None:
            updates = jax.tree.map(lambda u: lr * u, updates)
        new_params = optax.apply_updates(inlier_params, updates)
        keep_old = jnp.logical_not(finite)
        new_params = jax.tree.map(lambda n_, o: jnp.where(keep_old, o, n_),
                                  new_params, inlier_params)
        new_opt = jax.tree.map(
            lambda n_, o: jnp.where(keep_old, o, n_) if hasattr(n_, "shape") else n_,
            new_opt, opt_state)
        stats = dict(stats, grad_finite=finite)
        return new_params, new_state, new_opt, stats

    return step, loss_fn
