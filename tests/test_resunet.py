"""ResUNet2 structural tests: shapes, invariances, BN state flow, 6D mode.

No MinkowskiEngine is available for golden-value parity, so these tests verify
the properties a correct sparse U-Net must have:
- permutation equivariance: permuting input points permutes features identically
- translation invariance at stride granularity: shifting all coords by a
  multiple of the coarsest stride (8) leaves per-point features unchanged
- normalize_feature yields unit-norm rows
- train mode updates BN state; eval mode does not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.models import load_model
from deepglobalregistration_tpu.ops.sparse_grid import Grid


def _grid_from(coords, cap):
    n = len(coords)
    pad = np.full((cap - n, coords.shape[1]), 32766, np.int32)
    return Grid(jnp.asarray(np.concatenate([coords, pad], 0)), jnp.int32(n))


def _random_grid(rng, n, cap, d=3, lo=-10, hi=10):
    c = np.unique(rng.randint(lo, hi, size=(2 * n, d)).astype(np.int32), axis=0)
    rng.shuffle(c)
    return c[:n], _grid_from(c[:n], cap)


@pytest.fixture(scope="module")
def small_net():
    spec = load_model("ResUNetBN2F")  # smallest channels: fast on CPU
    cfg = spec.make_config(1, 8, bn_momentum=0.1, conv1_kernel_size=3,
                           normalize_feature=False, D=3)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    return spec, cfg, params, state


def _forward(spec, cfg, params, state, grid, feats, train=False):
    plan = jax.vmap(spec.build_plan, in_axes=(0, None))(
        jax.tree.map(lambda x: x[None], grid), cfg)
    return spec.apply(params, state, cfg, plan, feats[None], train=train)


def test_shapes_and_finite(rng, small_net):
    spec, cfg, params, state = small_net
    coords, grid = _random_grid(rng, 100, 128)
    feats = jnp.ones((128, 1), jnp.float32)
    out, _ = _forward(spec, cfg, params, state, grid, feats)
    assert out.shape == (1, 128, 8)
    assert np.isfinite(np.asarray(out)[0, :100]).all()


def test_permutation_equivariance(rng, small_net):
    spec, cfg, params, state = small_net
    coords, grid = _random_grid(rng, 90, 128)
    feats = jnp.asarray(rng.rand(128, 1).astype(np.float32))
    out1, _ = _forward(spec, cfg, params, state, grid, feats)

    perm = rng.permutation(90)
    grid_p = _grid_from(coords[perm], 128)
    feats_p = jnp.asarray(np.concatenate([np.asarray(feats)[:90][perm],
                                          np.asarray(feats)[90:]], 0))
    out2, _ = _forward(spec, cfg, params, state, grid_p, feats_p)
    np.testing.assert_allclose(np.asarray(out2)[0, :90], np.asarray(out1)[0, :90][perm],
                               rtol=1e-4, atol=1e-4)


def test_translation_invariance_stride8(rng, small_net):
    spec, cfg, params, state = small_net
    coords, grid = _random_grid(rng, 80, 96)
    feats = jnp.asarray(rng.rand(96, 1).astype(np.float32))
    out1, _ = _forward(spec, cfg, params, state, grid, feats)
    shift = np.array([8, -16, 24], np.int32)
    grid_s = _grid_from(coords + shift, 96)
    out2, _ = _forward(spec, cfg, params, state, grid_s, feats)
    np.testing.assert_allclose(np.asarray(out2)[0, :80], np.asarray(out1)[0, :80],
                               rtol=1e-4, atol=1e-4)


def test_normalize_feature_unit_norm(rng):
    spec = load_model("ResUNetBN2F")
    cfg = spec.make_config(1, 8, normalize_feature=True)
    params, state = spec.init(jax.random.PRNGKey(1), cfg)
    coords, grid = _random_grid(rng, 60, 64)
    out, _ = _forward(spec, cfg, params, state, grid, jnp.ones((64, 1), jnp.float32))
    norms = np.linalg.norm(np.asarray(out)[0, :60], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_train_updates_bn_state(rng, small_net):
    spec, cfg, params, state = small_net
    coords, grid = _random_grid(rng, 60, 64)
    feats = jnp.asarray(rng.rand(64, 1).astype(np.float32))
    _, st_eval = _forward(spec, cfg, params, state, grid, feats, train=False)
    _, st_train = _forward(spec, cfg, params, state, grid, feats, train=True)
    same = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), state, st_eval)
    assert all(jax.tree.leaves(same))
    diff = jax.tree.map(lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
                        state, st_train)
    assert any(jax.tree.leaves(diff))


def test_6d_hypercross_inlier_mode(rng):
    # 6D inlier net configuration (deep_global_registration.py:119-127) with the
    # HYPER_CROSS fast path (13 offsets instead of 729).
    spec = load_model("ResUNetBN2FX")
    cfg = spec.make_config(1, 1, conv1_kernel_size=3, normalize_feature=False, D=6)
    params, state = spec.init(jax.random.PRNGKey(2), cfg)
    coords, grid = _random_grid(rng, 50, 64, d=6, lo=-5, hi=5)
    out, _ = _forward(spec, cfg, params, state, grid, jnp.ones((64, 1), jnp.float32))
    assert out.shape == (1, 64, 1)
    assert np.isfinite(np.asarray(out)[0, :50]).all()


def test_registry():
    from deepglobalregistration_tpu.models import MODELS
    for name in ["ResUNetBN2", "ResUNetBN2B", "ResUNetBN2C", "ResUNetBN2D",
                 "ResUNetBN2E", "ResUNetBN2F", "ResUNetBN2CX", "ResUNetBN2FX"]:
        assert name in MODELS
    with pytest.raises(ValueError):
        load_model("NotANet")


def test_simplenet_families(rng):
    from deepglobalregistration_tpu.models import load_model
    for name in ["SimpleNetBNE", "SimpleNetBN2E", "SimpleNetBN3E", "SimpleNetINE"]:
        spec = load_model(name)
        cfg = spec.make_config(1, 8, conv1_kernel_size=3, normalize_feature=True)
        params, state = spec.init(jax.random.PRNGKey(0), cfg)
        coords, grid = _random_grid(rng, 70, 96)
        plan = jax.vmap(spec.build_plan, in_axes=(0, None))(
            jax.tree.map(lambda x: x[None], grid), cfg)
        out, _ = spec.apply(params, state, cfg, plan, jnp.ones((1, 96, 1), jnp.float32))
        assert out.shape == (1, 96, 8), name
        assert np.isfinite(np.asarray(out)[0, :70]).all(), name


def test_pyramidnet_families(rng):
    from deepglobalregistration_tpu.models import load_model
    for name in ["PyramidNet", "PyramidNet6NoBlock"]:
        spec = load_model(name)
        cfg = spec.make_config(1, 8, conv1_kernel_size=3, normalize_feature=False)
        params, state = spec.init(jax.random.PRNGKey(0), cfg)
        coords, grid = _random_grid(rng, 80, 128, lo=-40, hi=40)
        plan = jax.vmap(spec.build_plan, in_axes=(0, None, None))(
            jax.tree.map(lambda x: x[None], grid), cfg, 1)
        out, _ = spec.apply(params, state, cfg, plan, jnp.ones((1, 128, 1), jnp.float32))
        assert out.shape == (1, 128, 8), name
        assert np.isfinite(np.asarray(out)[0, :80]).all(), name


def test_pyramidnet_checkpoint_name_structure(rng):
    # param tree keys mirror torch Sequential names for converter parity
    from deepglobalregistration_tpu.models import load_model
    spec = load_model("PyramidNet")
    cfg = spec.make_config(1, 8)
    params, _ = spec.init(jax.random.PRNGKey(0), cfg)
    assert "kernel" in params["conv"]["0"]  # head conv_norm_non
    assert "weight" in params["conv"]["1"]
    assert "kernel" in params["pyramid"]["conv"]["0"]["0"]  # Sequential nesting
    assert "kernel" in params["pyramid"]["convtr"]["0"]
    assert "kernel" in params["pyramid"]["inner_module"]["cat_conv"]["0"]


def test_resunet_extended_families(rng):
    from deepglobalregistration_tpu.models import load_model
    for name in ["ResUNetBNF", "ResUNetBN2Fv2", "ResUNetSP", "ResUNetBN2SPC"]:
        spec = load_model(name)
        cfg = spec.make_config(1, 8, conv1_kernel_size=3, normalize_feature=False)
        params, state = spec.init(jax.random.PRNGKey(0), cfg)
        coords, grid = _random_grid(rng, 70, 96)
        plan = jax.vmap(spec.build_plan, in_axes=(0, None, None))(
            jax.tree.map(lambda x: x[None], grid), cfg, 1)
        out, _ = spec.apply(params, state, cfg, plan, jnp.ones((1, 96, 1), jnp.float32))
        assert out.shape == (1, 96, 8), name
        assert np.isfinite(np.asarray(out)[0, :70]).all(), name
