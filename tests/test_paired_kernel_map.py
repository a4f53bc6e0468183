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


@pytest.mark.parametrize("dense_members", [False, True])
def test_dense_keyed_paired_plan_matches_hash_keyed(rng, dense_members,
                                                    monkeypatch):
    """The 6D paired plan with dense-grid c0 keys must equal the hash-keyed
    build map-for-map (in-box clouds) — in both member layouts (the
    spatially-keyed dense_members layout replaces the group-id lookup + row
    gather with one patch gather; edges must be identical)."""
    import jax

    from deepglobalregistration_tpu.models import unet_plan

    monkeypatch.setattr(unet_plan, "DENSE_MEMBERS_6D", dense_members)
    n, cap = 150, 256
    c0 = np.unique(rng.randint(0, 14, size=(3 * n, 3)).astype(np.int32), axis=0)
    rng.shuffle(c0)
    c0 = c0[:n]
    c1 = rng.randint(0, 14, size=(n, 3)).astype(np.int32)
    c0p = np.concatenate([c0, np.full((cap - n, 3), 32766, np.int32)])
    c1p = np.concatenate([c1, np.full((cap - n, 3), 32766, np.int32)])

    args = (jnp.asarray(c0p), jnp.asarray(c1p), jnp.int32(n))
    p_hash = jax.jit(lambda a, b, m: unet_plan.build_paired_unet_plan(
        a, b, m, 3, kernel_map.HYPER_CUBE, 3, 1))(*args)
    p_dense = jax.jit(lambda a, b, m: unet_plan.build_paired_unet_plan(
        a, b, m, 3, kernel_map.HYPER_CUBE, 3, 1,
        dense_extent=(16, 16, 16)))(*args)

    def edge_sets(p):
        out = []
        for m in (p.conv1_kmap,) + p.self_kmaps + p.down_kmaps + p.up_kmaps:
            em = m.em
            k = np.asarray(em.tile_k)
            ti = np.asarray(em.tile_in)
            to = np.asarray(em.tile_out)
            edges = set()
            for t in range(len(k)):
                if k[t] < 0:
                    continue
                for s in range(ti.shape[1]):
                    if ti[t, s] >= 0 and to[t, s] >= 0:
                        edges.add((int(k[t]), int(ti[t, s]), int(to[t, s])))
            out.append(edges)
        return out

    for i, (eh, ed) in enumerate(zip(edge_sets(p_hash), edge_sets(p_dense))):
        assert eh == ed, f"map {i} differs"
    # In-box dense keys add no overflow of their own (both paths may still
    # flag d_cap truncation identically on this dense synthetic cloud).
    assert bool(p_dense.overflow) == bool(p_hash.overflow)
