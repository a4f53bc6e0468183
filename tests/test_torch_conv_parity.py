"""Cross-validate sparse conv semantics + kernel K-order against torch.

On a FULLY-OCCUPIED grid a generalized sparse convolution equals a standard
dense convolution, so torch's Conv3d / ConvTranspose3d provide an independent
oracle for (a) the gather-GEMM conv math and (b) the K-axis <-> spatial-offset
correspondence the torch-checkpoint converter assumes (ME odometer order:
dimension 0 fastest from the most-negative corner; kernel layout
/root/reference/model/residual_block.py:38-44, load path
/root/reference/core/deep_global_registration.py:88-116).

These close the zero-egress side of the K-order question (VERDICT round 2,
item 4): the enumeration itself is frozen by the odometer test in
test_sparse_conv.py, and here the full conv path — including stride-2 down
maps, transpose up maps, and the conv1=7 first layer — reproduces torch's
convolution under that correspondence. The one remaining assumption (that
MinkowskiEngine's C++ iterator matches its public kernel_region.hpp) is
decided by tools/golden_fcgf.py the moment real weights + a golden feature
dump exist.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from deepglobalregistration_tpu.ops import hashing, kernel_map, sparse_conv
from deepglobalregistration_tpu.ops.sparse_grid import Grid, stride_down


def _dense_grid(s: int):
    """All coordinates of [0, s)^3, plus a Grid over them (no padding)."""
    r = np.arange(s, dtype=np.int32)
    c0, c1, c2 = np.meshgrid(r, r, r, indexing="ij")
    coords = np.stack([c0.ravel(), c1.ravel(), c2.ravel()], axis=1)
    return coords


def _to_dense(feats: np.ndarray, coords: np.ndarray, s: int) -> np.ndarray:
    """Scatter [N, C] features onto a dense [1, C, s, s, s] torch-layout grid."""
    x = np.zeros((1, feats.shape[1], s, s, s), np.float32)
    for i, c in enumerate(coords):
        x[0, :, c[0], c[1], c[2]] = feats[i]
    return x


def _gather(dense, coords: np.ndarray) -> np.ndarray:
    """Read [N, C] rows back off a [1, C, ...] torch output tensor."""
    d = dense[0].numpy()
    return np.stack([d[:, c[0], c[1], c[2]] for c in coords])


def _torch_weight_to_k(w_t: np.ndarray, ks: int, transpose: bool) -> np.ndarray:
    """Map a torch conv weight to our [K, Cin, Cout] layout under the
    documented correspondence k = a0 + ks*a1 + ks^2*a2 (dim 0 fastest),
    offset_k = (a0, a1, a2) - r.

    torch Conv3d weight: [Cout, Cin, k0, k1, k2]; ConvTranspose3d weight:
    [Cin, Cout, k0, k1, k2]. Spatial weight dim j indexes input spatial dim j
    (cross-correlation), which is our coordinate column j."""
    if transpose:
        cin, cout = w_t.shape[0], w_t.shape[1]
        per_a = w_t.transpose(2, 3, 4, 0, 1)  # [k0, k1, k2, Cin, Cout]
    else:
        cout, cin = w_t.shape[0], w_t.shape[1]
        per_a = w_t.transpose(2, 3, 4, 1, 0)  # [k0, k1, k2, Cin, Cout]
    out = np.empty((ks ** 3, cin, cout), np.float32)
    for a2 in range(ks):
        for a1 in range(ks):
            for a0 in range(ks):
                out[a0 + ks * a1 + ks * ks * a2] = per_a[a0, a1, a2]
    return out


@pytest.mark.parametrize("ks,s", [(3, 5), (7, 8)])
def test_conv_matches_torch_conv3d(rng, ks, s):
    """Stride-1 conv (incl. conv1=7) == torch Conv3d with padding=r on a
    dense grid; only interior outputs compared when padding would differ —
    with padding=r torch zero-pads and our map yields -1 (skip) there, which
    are the same contribution, so ALL outputs match."""
    cin, cout = 4, 6
    coords = _dense_grid(s)
    n = len(coords)
    feats = rng.randn(n, cin).astype(np.float32)

    g = Grid(jnp.asarray(coords), jnp.int32(n))
    table = hashing.build_table(g.coords, g.num)
    offs = kernel_map.kernel_offsets(ks, 3)
    kmap = kernel_map.build_kernel_map(table, g, offs, unit=1)

    w_t = rng.randn(cout, cin, ks, ks, ks).astype(np.float32) * 0.2
    w = _torch_weight_to_k(w_t, ks, transpose=False)
    got = np.asarray(sparse_conv.sparse_conv(jnp.asarray(feats), jnp.asarray(w), kmap))[:n]

    x = _to_dense(feats, coords, s)
    ref = _gather(torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w_t), padding=ks // 2), coords)

    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_strided_conv_matches_torch_conv3d(rng):
    """Stride-2 down conv: our output coords are floor(c/2)*2 on the fine
    lattice; torch's stride-2 output index m corresponds to fine coord 2m.
    Window identity: in[2m + (a - r)] == torch's in[2m - pad + a] at pad=r."""
    cin, cout, ks, s = 4, 6, 3, 6
    coords = _dense_grid(s)
    n = len(coords)
    feats = rng.randn(n, cin).astype(np.float32)

    g_fine = Grid(jnp.asarray(coords), jnp.int32(n))
    g_coarse = stride_down(g_fine, 2)
    nc = int(g_coarse.num)
    coarse = np.asarray(g_coarse.coords)[:nc]

    table = hashing.build_table(g_fine.coords, g_fine.num)
    offs = kernel_map.kernel_offsets(ks, 3)
    kmap = kernel_map.build_kernel_map(table, g_coarse, offs, unit=1)

    w_t = rng.randn(cout, cin, ks, ks, ks).astype(np.float32) * 0.2
    w = _torch_weight_to_k(w_t, ks, transpose=False)
    got = np.asarray(sparse_conv.sparse_conv(jnp.asarray(feats), jnp.asarray(w), kmap))[:nc]

    x = _to_dense(feats, coords, s)
    ref = _gather(torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w_t), stride=2, padding=ks // 2),
        coarse // 2)

    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_transpose_conv_matches_torch_conv_transpose3d(rng):
    """Stride-2 transpose conv: coarse (fine coords 2m) -> fine lattice.
    torch ConvTranspose3d(stride=2, padding=r): out[o] += in[m] W[a] where
    o = 2m + a - r — exactly our transpose map o = p + offset_k with
    p = 2m, offset_k = a - r under the same odometer K-order."""
    cin, cout, ks, sm = 4, 6, 3, 4
    # coarse inputs at fine coords {0, 2, ..., 2(sm-1)}^3
    r = np.arange(sm, dtype=np.int32)
    m0, m1, m2 = np.meshgrid(r, r, r, indexing="ij")
    mcoords = np.stack([m0.ravel(), m1.ravel(), m2.ravel()], axis=1)
    coarse = (mcoords * 2).astype(np.int32)
    nin = len(coarse)
    feats = rng.randn(nin, cin).astype(np.float32)

    # fine output lattice: torch output size (sm-1)*2 - 2*r + ks = 2*sm - 1
    sf = 2 * sm - 1
    fine = _dense_grid(sf)
    nout = len(fine)

    g_coarse = Grid(jnp.asarray(coarse), jnp.int32(nin))
    g_fine = Grid(jnp.asarray(fine), jnp.int32(nout))
    table = hashing.build_table(g_coarse.coords, g_coarse.num)
    offs = kernel_map.kernel_offsets(ks, 3)
    kmap = kernel_map.build_kernel_map(table, g_fine, offs, unit=1, transpose=True)

    w_t = rng.randn(cin, cout, ks, ks, ks).astype(np.float32) * 0.2
    w = _torch_weight_to_k(w_t, ks, transpose=True)
    got = np.asarray(sparse_conv.sparse_conv(jnp.asarray(feats), jnp.asarray(w), kmap))[:nout]

    x = _to_dense(feats, mcoords, sm)
    ref_t = torch.nn.functional.conv_transpose3d(
        torch.from_numpy(x), torch.from_numpy(w_t), stride=2, padding=ks // 2)
    assert ref_t.shape[2:] == (sf, sf, sf)
    ref = _gather(ref_t, fine)

    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_even_sum_pool_matches_torch_avg_pool(rng):
    """k2/s2 sum pooling (ResUNetSP variants, resunet.py:256,298): even-kernel
    offsets live in [0, k) — window {2m, 2m+1}^3 == torch AvgPool3d(2) * 8."""
    cin, s = 5, 6
    coords = _dense_grid(s)
    n = len(coords)
    feats = rng.randn(n, cin).astype(np.float32)

    g_fine = Grid(jnp.asarray(coords), jnp.int32(n))
    g_coarse = stride_down(g_fine, 2)
    nc = int(g_coarse.num)
    coarse = np.asarray(g_coarse.coords)[:nc]

    table = hashing.build_table(g_fine.coords, g_fine.num)
    offs = kernel_map.kernel_offsets(2, 3)
    kmap = kernel_map.build_kernel_map(table, g_coarse, offs, unit=1)
    w = np.tile(np.eye(cin, dtype=np.float32)[None], (len(offs), 1, 1))
    got = np.asarray(sparse_conv.sparse_conv(jnp.asarray(feats), jnp.asarray(w), kmap))[:nc]

    x = _to_dense(feats, coords, s)
    ref = _gather(torch.nn.functional.avg_pool3d(torch.from_numpy(x), 2) * 8.0,
                  coarse // 2)

    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
