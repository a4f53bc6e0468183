"""BN folding: folded inference forward must match the live-BN forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.models import load_model
from deepglobalregistration_tpu.ops.sparse_grid import Grid
from deepglobalregistration_tpu.utils.fold_bn import fold_batch_norms


def _grid(rng, n, cap):
    c = np.unique(rng.randint(-10, 10, size=(2 * n, 3)).astype(np.int32), axis=0)
    rng.shuffle(c)
    c = c[:n]
    pad = np.full((cap - len(c), 3), 32766, np.int32)
    return Grid(jnp.asarray(np.concatenate([c, pad])), jnp.int32(len(c)))


@pytest.mark.parametrize("name", ["ResUNetBN2F", "SimpleNetBNE", "ResUNetBN2Fv2"])
def test_folded_matches_live_bn(rng, name):
    spec = load_model(name)
    cfg = spec.make_config(1, 8, conv1_kernel_size=3, normalize_feature=False)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    # non-trivial running stats so the fold actually does something
    state = jax.tree.map(
        lambda x: x + 0.3 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape) / x.size,
        state)

    grid = _grid(rng, 90, 128)
    plan = jax.vmap(spec.build_plan, in_axes=(0, None))(
        jax.tree.map(lambda x: x[None], grid), cfg)
    feats = jnp.asarray(rng.rand(1, 128, 1).astype(np.float32))

    ref, _ = spec.apply(params, state, cfg, plan, feats, train=False)

    fp, fs, fcfg = fold_batch_norms(params, state, cfg)
    assert fcfg.norm_type == "NONE"
    got, _ = spec.apply(jax.tree.map(jnp.asarray, fp), fs, fcfg, plan, feats,
                        train=False)
    n = 90
    np.testing.assert_allclose(np.asarray(got)[0, :n], np.asarray(ref)[0, :n],
                               rtol=1e-4, atol=1e-4)


def test_fold_noop_for_in_norm(rng):
    spec = load_model("SimpleNetINE")
    cfg = spec.make_config(1, 8)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    fp, fs, fcfg = fold_batch_norms(params, state, cfg)
    assert fcfg.norm_type == "IN"  # unchanged
