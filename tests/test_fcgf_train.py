"""FCGF self-training: hardest-contrastive loss + train step (CPU, tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepglobalregistration_tpu.core import fcgf_train as ft
from deepglobalregistration_tpu.models import load_model
from deepglobalregistration_tpu.parallel import data_parallel as dp


def _loss_args(rng, n=64, p=32, c=8):
    batch = dp.synthetic_pair_batch(rng, 1, n, p)
    f0 = jnp.asarray(rng.randn(n, c), jnp.float32)
    f0 = f0 / jnp.linalg.norm(f0, axis=-1, keepdims=True)
    return batch, f0


def test_loss_zero_when_pos_aligned_and_negs_far():
    """Identical features at positives + orthogonal negatives -> ~0 loss."""
    rng = np.random.RandomState(0)
    batch, _ = _loss_args(rng)
    n = batch.xyz0.shape[1]
    m = int(batch.num0[0])
    # one-hot features: positive pairs identical (d=0), every other pair at
    # distance sqrt(2) = 1.414 > neg_margin 1.4 -> both terms vanish
    f = jnp.eye(n, dtype=jnp.float32)
    cfg = ft.FCGFLossConfig(num_pos=64, num_neg=64, neg_radius=1e-6)
    loss, stats = ft.hardest_contrastive_loss(
        jax.random.PRNGKey(0), f, f, batch.xyz0[0], batch.xyz1[0],
        batch.T_gt[0], batch.pos_pairs[0], batch.pos_num[0],
        batch.num0[0], batch.num1[0], cfg)
    assert float(stats["pos_loss"]) < 1e-9
    assert float(loss) < 1e-3  # sqrt(2) sits a hair above the 1.4 margin


def test_loss_penalizes_collapsed_features():
    """All-equal features: positives free but negatives at margin^2."""
    rng = np.random.RandomState(1)
    batch, _ = _loss_args(rng)
    n = batch.xyz0.shape[1]
    f = jnp.ones((n, 8), jnp.float32) / np.sqrt(8.0)
    cfg = ft.FCGFLossConfig(num_pos=64, num_neg=64, neg_radius=1e-6)
    loss, stats = ft.hardest_contrastive_loss(
        jax.random.PRNGKey(0), f, f, batch.xyz0[0], batch.xyz1[0],
        batch.T_gt[0], batch.pos_pairs[0], batch.pos_num[0],
        batch.num0[0], batch.num1[0], cfg)
    assert float(stats["pos_loss"]) < 1e-9
    assert abs(float(stats["neg_loss"]) - 1.4 ** 2) < 1e-5


def test_exclusion_radius_removes_true_matches():
    """With a huge exclusion radius every candidate is masked -> no neg loss."""
    rng = np.random.RandomState(2)
    batch, _ = _loss_args(rng)
    n = batch.xyz0.shape[1]
    f = jnp.ones((n, 8), jnp.float32) / np.sqrt(8.0)  # collapsed
    cfg = ft.FCGFLossConfig(num_pos=64, num_neg=64, neg_radius=1e9)
    loss, stats = ft.hardest_contrastive_loss(
        jax.random.PRNGKey(0), f, f, batch.xyz0[0], batch.xyz1[0],
        batch.T_gt[0], batch.pos_pairs[0], batch.pos_num[0],
        batch.num0[0], batch.num1[0], cfg)
    assert float(stats["neg_loss"]) == 0.0


@pytest.mark.parametrize("model", ["SimpleNetBN2C"])
def test_fcgf_train_step_learns(model):
    """A few steps on a fixed tiny batch: finite grads, loss decreases."""
    spec = load_model(model)
    cfg = spec.make_config(1, 8, bn_momentum=0.1, conv1_kernel_size=3,
                           normalize_feature=True, D=3)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    loss_cfg = ft.FCGFLossConfig(num_pos=64, num_neg=64, neg_radius=0.1)
    step, loss_fn = ft.make_fcgf_train_step(spec, cfg, loss_cfg, opt)
    step = jax.jit(step)

    rng = np.random.RandomState(3)
    batch = dp.synthetic_pair_batch(rng, 2, 128, 64)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        params, state, opt_state, stats = step(params, state, opt_state,
                                               sub, batch)
        assert bool(stats["grad_finite"])
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]
