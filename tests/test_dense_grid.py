"""Dense-grid lookup backend vs the hash backend (must agree exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.models import unet_plan
from deepglobalregistration_tpu.ops import dense_grid, hashing, kernel_map
from deepglobalregistration_tpu.ops.sparse_grid import Grid


def _grid(rng, n, cap, lo=-12, hi=12):
    c = np.unique(rng.randint(lo, hi, size=(2 * n, 3)).astype(np.int32), axis=0)
    rng.shuffle(c)
    c = c[:n]
    pad = np.full((cap - len(c), 3), 32766, np.int32)
    return Grid(jnp.asarray(np.concatenate([c, pad])), jnp.int32(len(c)))


def test_dense_table_lookup_matches_hash(rng):
    g = _grid(rng, 120, 128)
    ext = (32, 32, 32)
    dt = dense_grid.build_dense_table(g, ext)
    ht = hashing.build_table(g.coords, g.num)
    q = rng.randint(-14, 14, size=(300, 3)).astype(np.int32)
    got_d = np.asarray(dense_grid.dense_lookup_cols(
        dt, ext, 0, tuple(jnp.asarray(q[:, i]) for i in range(3))))
    got_h = np.asarray(hashing.lookup(ht, jnp.asarray(q)))
    np.testing.assert_array_equal(got_d, got_h)
    assert not bool(dt.overflow)


def test_dense_overflow_flag(rng):
    g = _grid(rng, 100, 128, lo=-40, hi=40)
    dt = dense_grid.build_dense_table(g, (16, 16, 16))
    assert bool(dt.overflow)


@pytest.mark.parametrize("transpose", [False, True])
def test_dense_kernel_map_matches_hash(rng, transpose):
    from deepglobalregistration_tpu.ops.sparse_grid import stride_down

    g0 = _grid(rng, 150, 160)
    g1 = stride_down(g0, 2)
    offs = kernel_map.kernel_offsets(3, 3)
    ext = (40, 40, 40)
    if not transpose:
        dt = dense_grid.build_dense_table(g0, ext, 0)
        ht = hashing.build_table(g0.coords, g0.num)
        got_d = np.asarray(dense_grid.build_kernel_map_dense(dt, ext, 0, g1, offs, 1))
        got_h = np.asarray(kernel_map.build_kernel_map(ht, g1, offs, 1))
    else:
        ext1 = (20, 20, 20)
        dt = dense_grid.build_dense_table(g1, ext1, 1)
        ht = hashing.build_table(g1.coords, g1.num)
        got_d = np.asarray(dense_grid.build_kernel_map_dense(dt, ext1, 1, g0, offs, 1,
                                                             transpose=True))
        got_h = np.asarray(kernel_map.build_kernel_map(ht, g0, offs, 1, transpose=True))
    np.testing.assert_array_equal(got_d, got_h)


def test_unet_plan_dense_matches_hash(rng):
    g0 = _grid(rng, 150, 160)
    plan_h = unet_plan.build_unet_plan(g0, 3, kernel_map.HYPER_CUBE, 3, 4,
                                       level_shrink=1)
    plan_d = unet_plan.build_unet_plan(g0, 3, kernel_map.HYPER_CUBE, 3, 4,
                                       level_shrink=1, dense_extent=(40, 40, 40))
    for a, b in zip(jax.tree.leaves(plan_h), jax.tree.leaves(plan_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("ks", [3, 5, 7])
def test_conv1_ones_occupancy_matches_kmap(rng, ks):
    """O[j, k] must equal (kernel map entry present) for every offset —
    including rows at the box boundary where the z-window straddles words."""
    g = _grid(rng, 120, 128, lo=0, hi=20)
    ext = (20, 24, 33)  # non-multiple-of-32 z tests the straddle path
    dt = dense_grid.build_dense_table(g, ext)
    offs = kernel_map.kernel_offsets(ks, 3, kernel_map.HYPER_CUBE)
    km = dense_grid.build_kernel_map_dense(dt, ext, 0, g, offs, unit=1)
    occ = dense_grid.conv1_ones_occupancy(dt, ext, g, ks)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(km >= 0).T)


@pytest.mark.parametrize("dense", [True, False])
def test_unet_plan_ones_input_feature_parity(rng, dense):
    """FCGF forward with the conv1-ones shortcut == generic conv path."""
    from deepglobalregistration_tpu.models import load_model

    spec = load_model("ResUNetBN")
    cfg = spec.make_config(1, 16, conv1_kernel_size=5, D=3)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    g = _grid(rng, 200, 256, lo=0, hi=16)
    de = (24, 24, 24) if dense else None
    feats = jnp.ones((1, 256, 1), jnp.float32)
    gb = jax.tree.map(lambda x: x[None], g)
    plan_ref = jax.vmap(spec.build_plan, in_axes=(0, None, None, None, None))(
        gb, cfg, 2, de, False)
    plan_ones = jax.vmap(spec.build_plan, in_axes=(0, None, None, None, None))(
        gb, cfg, 2, de, True)
    assert plan_ones.conv1_ones is not None and plan_ones.conv1_kmap is None
    out_ref, _ = spec.apply(params, state, cfg, plan_ref, feats, train=False)
    out_ones, _ = spec.apply(params, state, cfg, plan_ones, feats, train=False)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_ones),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ks", [3, 5])
def test_padded_patch_paths_match_unpadded(rng, ks):
    """Tables built with a pad border answer every probe form identically.

    The pad enables the one-gather-per-row patch fast path
    (dense_grid.PATCH_GATHER): kernel maps, conv1 occupancy, and plain
    lookups must all equal the unpadded (per-offset) build exactly —
    including rows at the box boundary, whose neighborhoods now land in the
    empty border instead of being clamp-masked."""
    g = _grid(rng, 120, 128, lo=0, hi=20)
    ext = (20, 24, 33)
    pad = ks // 2 + 1  # +1 margin: the kmap patch dispatch requires it
    dt0 = dense_grid.build_dense_table(g, ext)
    dtp = dense_grid.build_dense_table(g, ext, pad=pad)
    pext = dense_grid.padded_extent(ext, pad)
    offs = kernel_map.kernel_offsets(ks, 3, kernel_map.HYPER_CUBE)

    km0 = dense_grid.build_kernel_map_dense(dt0, ext, 0, g, offs, unit=1)
    kmp = dense_grid.build_kernel_map_dense(dtp, pext, 0, g, offs, unit=1,
                                            pad=pad)
    np.testing.assert_array_equal(np.asarray(km0), np.asarray(kmp))

    occ0 = dense_grid.conv1_ones_occupancy(dt0, ext, g, ks)
    occp = dense_grid.conv1_ones_occupancy(dtp, pext, g, ks, pad=pad)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occp))

    q = rng.randint(-2, 24, size=(300, 3)).astype(np.int32)
    qcols = tuple(jnp.asarray(q[:, i]) for i in range(3))
    l0 = dense_grid.dense_lookup_cols(dt0, ext, 0, qcols)
    lp = dense_grid.dense_lookup_cols(dtp, pext, 0, qcols)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(lp))

    if ks == 3:
        lex = dense_grid.patch_lookup_cube(
            dtp, pext, 0, g.coords, g.valid_mask(), 3, pad)
        # lex order (dim 0 slowest) vs the kernel map's odometer (dim 0
        # fastest): reversing each offset's digit order maps one to the other.
        perm = np.arange(27).reshape(3, 3, 3).transpose(2, 1, 0).reshape(-1)
        np.testing.assert_array_equal(np.asarray(lex)[perm], np.asarray(km0))


def test_up_from_down_matches_transpose_probe(rng):
    """Derived transpose maps == the probe-built ones (same edge set).

    up_from_down scatters the down map's edges instead of probing the coarse
    table from every fine row (the dense plan's biggest element-gather cost,
    dense_grid.py:94 ~17 ms/pair on chip)."""
    from deepglobalregistration_tpu.ops.sparse_grid import stride_down

    g0 = _grid(rng, 150, 160)
    g1 = stride_down(g0, 2)
    for ks in (2, 3):
        offs = kernel_map.kernel_offsets(ks, 3)
        ht0 = hashing.build_table(g0.coords, g0.num)
        down = kernel_map.build_kernel_map(ht0, g1, offs, 1)
        ht1 = hashing.build_table(g1.coords, g1.num)
        up_probe = kernel_map.build_kernel_map(ht1, g0, offs, 1,
                                               transpose=True)
        up_derived = unet_plan.up_from_down(down, g0.capacity)
        np.testing.assert_array_equal(np.asarray(up_derived),
                                      np.asarray(up_probe))
