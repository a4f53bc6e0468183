"""Sparse grid / kernel map / sparse conv vs independent numpy dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.ops import hashing, kernel_map, sparse_conv
from deepglobalregistration_tpu.ops.sparse_grid import Grid, stride_down, voxelize


def _pad(arr, n, fill=0):
    out = np.full((n,) + arr.shape[1:], fill, arr.dtype)
    out[: len(arr)] = arr
    return out


def _unique_coords(rng, n, d, lo=-8, hi=8):
    c = np.unique(rng.randint(lo, hi, size=(n * 2, d)).astype(np.int32), axis=0)
    rng.shuffle(c)
    return c[:n]


def _oracle_kmap(in_coords, out_coords, offsets, unit, transpose=False):
    table = {tuple(c): i for i, c in enumerate(in_coords)}
    sign = -1 if transpose else 1
    idx = np.full((len(offsets), len(out_coords)), -1, np.int32)
    for j, oc in enumerate(out_coords):
        for k, off in enumerate(offsets):
            idx[k, j] = table.get(tuple(oc + sign * off * unit), -1)
    return idx


def test_voxelize_matches_numpy(rng):
    n, cap = 150, 256
    xyz = rng.randn(n, 3).astype(np.float32) * 0.3
    voxel = 0.1
    xyz_p = _pad(xyz, cap, fill=123.0)  # garbage padding must be ignored
    xyz_sel, grid = jax.jit(voxelize, static_argnums=2)(jnp.asarray(xyz_p), jnp.int32(n), voxel)

    expect_coords = np.unique(np.floor(xyz / voxel).astype(np.int32), axis=0)
    nu = int(grid.num)
    assert nu == len(expect_coords)
    got = np.asarray(grid.coords)[:nu]
    np.testing.assert_array_equal(got[np.lexsort(got.T[::-1])], expect_coords)
    # selected xyz quantize back to their voxel coords
    sel = np.asarray(xyz_sel)[:nu]
    np.testing.assert_array_equal(np.floor(sel / voxel).astype(np.int32), got)


def test_stride_down_matches_numpy(rng):
    coords = _unique_coords(rng, 100, 3)
    cap = 128
    g = Grid(jnp.asarray(_pad(coords, cap, 999)), jnp.int32(len(coords)))
    g2 = jax.jit(stride_down, static_argnums=1)(g, 2)
    expect = np.unique((np.floor_divide(coords, 2) * 2), axis=0)
    nu = int(g2.num)
    assert nu == len(expect)
    got = np.asarray(g2.coords)[:nu]
    np.testing.assert_array_equal(got[np.lexsort(got.T[::-1])], expect)


@pytest.mark.parametrize("d,region,ks", [(3, kernel_map.HYPER_CUBE, 3),
                                         (3, kernel_map.HYPER_CUBE, 5),
                                         (6, kernel_map.HYPER_CROSS, 3),
                                         (3, kernel_map.HYPER_CROSS, 3)])
def test_self_kernel_map_vs_oracle(rng, d, region, ks):
    coords = _unique_coords(rng, 60, d, lo=-4, hi=4)
    cap = 64
    g = Grid(jnp.asarray(_pad(coords, cap, 999)), jnp.int32(len(coords)))
    table = hashing.build_table(g.coords, g.num)
    offs = kernel_map.kernel_offsets(ks, d, region)
    got = np.asarray(kernel_map.build_kernel_map(table, g, offs, unit=1))
    expect = _oracle_kmap(coords, coords, offs, 1)
    np.testing.assert_array_equal(got[:, : len(coords)], expect)
    assert (got[:, len(coords):] == -1).all()


def test_offsets_shapes():
    assert kernel_map.kernel_offsets(3, 3).shape == (27, 3)
    assert kernel_map.kernel_offsets(7, 3).shape == (343, 3)
    assert kernel_map.kernel_offsets(3, 6).shape == (729, 6)
    assert kernel_map.kernel_offsets(3, 6, kernel_map.HYPER_CROSS).shape == (13, 6)
    # dim 0 varies fastest in cube enumeration
    offs = kernel_map.kernel_offsets(3, 2)
    np.testing.assert_array_equal(offs[:4], [[-1, -1], [0, -1], [1, -1], [-1, 0]])
    # cross: center first
    np.testing.assert_array_equal(kernel_map.kernel_offsets(3, 2, kernel_map.HYPER_CROSS),
                                  [[0, 0], [-1, 0], [1, 0], [0, -1], [0, 1]])


@pytest.mark.parametrize("transpose", [False, True])
def test_strided_and_transpose_conv_vs_dense_oracle(rng, transpose):
    d, cin, cout = 3, 5, 7
    fine = _unique_coords(rng, 80, d)
    cap = 96
    g_fine = Grid(jnp.asarray(_pad(fine, cap, 999)), jnp.int32(len(fine)))
    g_coarse = stride_down(g_fine, 2)
    nc = int(g_coarse.num)
    coarse = np.asarray(g_coarse.coords)[:nc]

    offs = kernel_map.kernel_offsets(3, d)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    if not transpose:
        # stride-2 down conv: fine (ts 1) -> coarse (ts 2), offsets in units of in-ts (1)
        in_coords, in_cap, out_grid = fine, cap, g_coarse
        feats = rng.randn(len(fine), cin).astype(np.float32)
        table = hashing.build_table(g_fine.coords, g_fine.num)
        kmap = kernel_map.build_kernel_map(table, out_grid, offs, unit=1)
        out_coords, out_n = coarse, nc
    else:
        # transpose conv: coarse (ts 2) -> fine (ts 1), offsets in units of out-ts (1)
        in_coords, in_cap, out_grid = coarse, cap, g_fine
        feats = rng.randn(nc, cin).astype(np.float32)
        table = hashing.build_table(g_coarse.coords, g_coarse.num)
        kmap = kernel_map.build_kernel_map(table, out_grid, offs, unit=1, transpose=True)
        out_coords, out_n = fine, len(fine)

    feats_p = _pad(feats, in_cap)
    got = np.asarray(sparse_conv.sparse_conv(jnp.asarray(feats_p), jnp.asarray(w), kmap))

    okmap = _oracle_kmap(in_coords, out_coords, offs, 1, transpose=transpose)
    expect = np.zeros((out_n, cout), np.float32)
    for j in range(out_n):
        for k in range(27):
            if okmap[k, j] >= 0:
                expect[j] += feats[okmap[k, j]] @ w[k]
    np.testing.assert_allclose(got[:out_n], expect, rtol=1e-4, atol=1e-4)


def test_conv_k1_is_matmul(rng):
    feats = rng.randn(10, 4).astype(np.float32)
    w = rng.randn(1, 4, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    kmap = jnp.arange(10, dtype=jnp.int32)[None, :]
    got = np.asarray(sparse_conv.sparse_conv(jnp.asarray(feats), jnp.asarray(w), kmap,
                                             bias=jnp.asarray(b)))
    np.testing.assert_allclose(got, feats @ w[0] + b, rtol=1e-5, atol=1e-5)


def test_sum_pool_vs_oracle(rng):
    coords = _unique_coords(rng, 40, 3)
    cap = 48
    g = Grid(jnp.asarray(_pad(coords, cap, 999)), jnp.int32(len(coords)))
    table = hashing.build_table(g.coords, g.num)
    offs = kernel_map.kernel_offsets(3, 3)
    kmap = kernel_map.build_kernel_map(table, g, offs, unit=1)
    feats = rng.randn(len(coords), 5).astype(np.float32)
    got = np.asarray(sparse_conv.sparse_sum_pool(jnp.asarray(_pad(feats, cap)), kmap))
    okmap = _oracle_kmap(coords, coords, offs, 1)
    for j in range(len(coords)):
        expect = sum(feats[okmap[k, j]] for k in range(27) if okmap[k, j] >= 0)
        np.testing.assert_allclose(got[j], expect, rtol=1e-5, atol=1e-5)


def test_batch_norm_train_matches_torch_semantics(rng):
    import torch

    b, n, c = 2, 32, 4
    feats = rng.randn(b, n, c).astype(np.float32)
    nums = np.array([20, 32])
    mask = np.arange(n)[None, :] < nums[:, None]
    gamma = rng.rand(c).astype(np.float32) + 0.5
    beta = rng.randn(c).astype(np.float32)
    rm = np.zeros(c, np.float32)
    rv = np.ones(c, np.float32)

    out, nm, nv = sparse_conv.batch_norm_train(
        jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(rm), jnp.asarray(rv), momentum=0.1)

    bn = torch.nn.BatchNorm1d(c, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
    flat = np.concatenate([feats[i, : nums[i]] for i in range(b)], 0)
    ref = bn(torch.from_numpy(flat)).detach().numpy()

    got_flat = np.concatenate([np.asarray(out)[i, : nums[i]] for i in range(b)], 0)
    np.testing.assert_allclose(got_flat, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nm), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), bn.running_var.numpy(), rtol=1e-4, atol=1e-4)


def test_kernel_offsets_match_me_odometer_order():
    """Freeze the HYPER_CUBE K-axis order against an independent simulation of
    MinkowskiEngine's region iterator (public kernel_region.hpp ++ operator:
    start at the most-negative corner, increment dimension 0 first, carry into
    higher dimensions). The torch checkpoint converter relies on this order;
    tools/golden_fcgf.py can auto-try alternatives against real weights."""
    from deepglobalregistration_tpu.ops import kernel_map as km

    def me_odometer(kernel_size, ndim):
        r = kernel_size // 2
        lower = [-r] * ndim
        upper = [r] * ndim
        cur = list(lower)
        out = [list(cur)]
        while True:
            d = 0
            while d < ndim:
                cur[d] += 1
                if cur[d] <= upper[d]:
                    break
                cur[d] = lower[d]
                d += 1
            if d == ndim:
                break
            out.append(list(cur))
        return np.array(out, np.int32)

    for k, d in [(3, 3), (7, 3), (3, 6), (5, 2)]:
        got = km.kernel_offsets(k, d, km.HYPER_CUBE)
        expect = me_odometer(k, d)
        assert got.shape == expect.shape == (k ** d, d)
        np.testing.assert_array_equal(got, expect)
