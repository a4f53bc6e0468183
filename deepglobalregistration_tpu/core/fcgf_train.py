"""FCGF self-training: hardest-contrastive metric learning, TPU-jitted.

The reference consumes *pretrained* FCGF checkpoints (README.md:86-90;
core/deep_global_registration.py:97-116) and never trains the feature net
itself — training lives in the upstream FCGF project. This zero-egress image
has no checkpoints, so to prove the train -> validate -> benchmark chain end
to end (reference flow core/trainer.py:120-155 + scripts/test_3dmatch.py)
the feature net must be self-trained. This module implements FCGF's
hardest-contrastive loss (Choy et al., ICCV 2019, eq. 5) as a pure jitted
step over the same PairBatch the inlier trainer uses:

    L = mean_pos [d(f0_i, f1_j) - m_pos]_+^2
      + 1/2 (mean_i [m_neg - min_k d(f0_i, f1_k)]_+^2 +
             mean_j [m_neg - min_k d(f1_j, f0_k)]_+^2)

with the hardest negative mined over a random candidate subset of the other
cloud, excluding candidates lying within ``neg_radius`` (in 3D, after the GT
alignment) of the anchor's true correspondent — those are correct matches,
not negatives. All shapes static: positives subsample to ``num_pos``, the
candidate set to ``num_neg`` via modulo draws from the valid range.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.sparse_grid import Grid
from .train_step import PairBatch


class FCGFLossConfig(NamedTuple):
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    num_pos: int = 1024  # sampled positive pairs per cloud pair
    num_neg: int = 1024  # negative candidates per anchor side
    neg_radius: float = 0.1  # 3D exclusion radius around the true match (m)


def hardest_contrastive_loss(key, f0, f1, xyz0, xyz1, T_gt,
                             pos_pairs, pos_num, num0, num1,
                             cfg: FCGFLossConfig):
    """One pair's loss. f0/f1 [N, C]; xyz in the ORIGINAL (unaligned) frames;
    T_gt maps cloud-0 into cloud-1 coordinates; pos_pairs [P, 2] padded."""
    k_pos, k_n0, k_n1 = jax.random.split(key, 3)
    P = pos_pairs.shape[0]

    # -- sample positives (modulo draw over the valid prefix)
    n_valid = jnp.maximum(pos_num, 1)
    sel = jax.random.randint(k_pos, (cfg.num_pos,), 0, 1 << 30) % n_valid
    pi = pos_pairs[sel, 0]
    pj = pos_pairs[sel, 1]
    have_pos = pos_num > 0

    a0 = f0[pi]  # anchors in cloud 0 [S, C]
    a1 = f1[pj]  # their true correspondents [S, C]
    d_pos = jnp.linalg.norm(a0 - a1 + 1e-12, axis=-1)
    pos_loss = jnp.mean(jnp.maximum(d_pos - cfg.pos_margin, 0.0) ** 2)

    # cloud-0 points mapped into cloud-1's frame for the 3D exclusion test
    xyz0_in1 = xyz0 @ T_gt[:3, :3].T + T_gt[:3, 3]

    def hardest(kk, anchors, anchor_xyz, cand_f, cand_xyz, cand_n):
        """min feature distance to candidates outside the 3D exclusion ball."""
        ci = jax.random.randint(kk, (cfg.num_neg,), 0, 1 << 30) % \
            jnp.maximum(cand_n, 1)
        cf = cand_f[ci]  # [C2, C]
        cx = cand_xyz[ci]  # [C2, 3]
        # [S, C2] feature distances via the dot trick (MXU-friendly)
        d2 = (jnp.sum(anchors ** 2, -1)[:, None]
              + jnp.sum(cf ** 2, -1)[None, :]
              - 2.0 * anchors @ cf.T)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        near = jnp.sum((anchor_xyz[:, None, :] - cx[None, :, :]) ** 2, -1) \
            < cfg.neg_radius ** 2
        d = jnp.where(near, jnp.inf, d)
        dmin = jnp.min(d, axis=1)
        # all candidates excluded (tiny clouds): no negative signal for row
        ok = jnp.isfinite(dmin)
        neg = jnp.where(ok, jnp.maximum(cfg.neg_margin - dmin, 0.0), 0.0)
        return jnp.sum(neg ** 2) / jnp.maximum(jnp.sum(ok), 1)

    # anchor in 0 vs candidates in 1 (exclude near the true match xyz1[pj]);
    # candidate positions compare in cloud-1's frame
    neg0 = hardest(k_n0, a0, xyz1[pj], f1, xyz1, num1)
    # anchor in 1 vs candidates in 0 (positions in cloud-1 frame via T_gt)
    neg1 = hardest(k_n1, a1, xyz0_in1[pi], f0, xyz0_in1, num0)

    loss = pos_loss + 0.5 * (neg0 + neg1)
    stats = {"pos_loss": pos_loss, "neg_loss": 0.5 * (neg0 + neg1),
             "d_pos_mean": jnp.mean(d_pos)}
    return jnp.where(have_pos, loss, 0.0), stats


def make_fcgf_train_step(fcgf_spec, fcgf_cfg, loss_cfg: FCGFLossConfig,
                         optimizer: optax.GradientTransformation,
                         level_shrink: int = 2, dense_extent=None):
    """Jitted step(params, state, opt_state, key, batch) -> updated + stats.

    BatchNorm runs in train mode over the stacked 2B-cloud batch (like ME's
    batched sparse tensors in the upstream FCGF trainer). dense_extent: static
    3D cell box for the dense-index kernel-map fast path — required at
    3DMatch scale on TPU (the hash-probe gather layout pads ~20x and OOMs)."""

    def loss_fn(params, state, key, batch: PairBatch):
        b, n = batch.xyz0.shape[:2]
        grids = Grid(coords=jnp.concatenate([batch.coords0, batch.coords1], 0),
                     num=jnp.concatenate([batch.num0, batch.num1], 0))
        plan = jax.vmap(fcgf_spec.build_plan,
                        in_axes=(0, None, None, None, None))(
            grids, fcgf_cfg, level_shrink, dense_extent, True)
        feats_in = jnp.ones((2 * b, n, 1), jnp.float32)
        feats, new_state = fcgf_spec.apply(params, state, fcgf_cfg, plan,
                                           feats_in, train=True)
        feats = feats.astype(jnp.float32)
        f0, f1 = feats[:b], feats[b:]
        keys = jax.random.split(key, b)
        losses, stats = jax.vmap(
            lambda kk, ff0, ff1, x0, x1, tg, pp, pn, n0, n1:
            hardest_contrastive_loss(kk, ff0, ff1, x0, x1, tg, pp, pn, n0, n1,
                                     loss_cfg))(
            keys, f0, f1, batch.xyz0, batch.xyz1, batch.T_gt,
            batch.pos_pairs, batch.pos_num, batch.num0, batch.num1)
        loss = jnp.mean(losses)
        stats = {k: jnp.mean(v) for k, v in stats.items()}
        return loss, (new_state, dict(stats, loss=loss))

    def step(params, state, opt_state, key, batch: PairBatch):
        (loss, (new_state, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, key, batch)
        finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(g))
                                    for g in jax.tree.leaves(grads)]))
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep_old = jnp.logical_not(finite)
        new_params = jax.tree.map(lambda nw, od: jnp.where(keep_old, od, nw),
                                  new_params, params)
        return new_params, new_state, new_opt, dict(stats, grad_finite=finite)

    return step, loss_fn
