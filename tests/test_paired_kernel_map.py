"""Paired 6D kernel map vs the generic hash builder (must agree exactly)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.ops import hashing, kernel_map, paired_kernel_map
from deepglobalregistration_tpu.ops.sparse_grid import Grid


@pytest.mark.parametrize("region", [kernel_map.HYPER_CUBE, kernel_map.HYPER_CROSS])
def test_paired_matches_generic(rng, region):
    n, cap = 120, 128
    # unique c0 (one correspondence per cloud-0 voxel), arbitrary matched c1
    c0 = np.unique(rng.randint(-8, 8, size=(3 * n, 3)).astype(np.int32), axis=0)
    rng.shuffle(c0)
    c0 = c0[:n]
    c1 = rng.randint(-8, 8, size=(n, 3)).astype(np.int32)
    c0p = np.concatenate([c0, np.full((cap - n, 3), 32766, np.int32)])
    c1p = np.concatenate([c1, np.full((cap - n, 3), 32766, np.int32)])
    coords6 = np.concatenate([c0p, c1p], axis=1)

    offs = kernel_map.kernel_offsets(3, 6, region)
    got = np.asarray(paired_kernel_map.build_kernel_map_paired(
        jnp.asarray(c0p), jnp.asarray(c1p), jnp.int32(n), offs))

    grid6 = Grid(jnp.asarray(coords6), jnp.int32(n))
    table6 = hashing.build_table(grid6.coords, grid6.num)
    expect = np.asarray(kernel_map.build_kernel_map(table6, grid6, offs, unit=1))
    np.testing.assert_array_equal(got, expect)
