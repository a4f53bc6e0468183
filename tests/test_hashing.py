"""Unit tests for coordinate hashing vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepglobalregistration_tpu.ops import hashing


def _random_coords(rng, n, d, lo=-50, hi=50):
    return rng.randint(lo, hi, size=(n, d)).astype(np.int32)


@pytest.mark.parametrize("d", [3, 6])
def test_pack_rows_lexicographic(rng, d):
    coords = _random_coords(rng, 200, d)
    words = hashing.pack_rows(jnp.asarray(coords))
    # Sort by packed words must equal numpy lexsort over rows (last key primary in
    # np.lexsort, so feed reversed columns).
    order_np = np.lexsort(tuple(coords[:, i] for i in reversed(range(d))))
    idx = jnp.arange(coords.shape[0], dtype=jnp.int32)
    sorted_ops = jax.lax.sort(tuple(words) + (idx,), num_keys=len(words) + 1)
    order_jax = np.asarray(sorted_ops[-1])
    # Compare resulting row sequences (ties possible with duplicate rows).
    np.testing.assert_array_equal(coords[order_jax], coords[order_np])


@pytest.mark.parametrize("d", [3, 6])
def test_lookup_finds_present_and_rejects_absent(rng, d):
    n = 300
    coords = _random_coords(rng, n, d)
    # Make rows unique for exact index checking.
    coords = np.unique(coords, axis=0)
    n_unique = coords.shape[0]
    pad = np.zeros((n - n_unique, d), np.int32) if n_unique < n else np.zeros((0, d), np.int32)
    padded = np.concatenate([coords, pad], 0)
    table = hashing.build_table(jnp.asarray(padded), jnp.int32(n_unique))

    # Present queries
    q_idx = rng.randint(0, n_unique, size=64)
    got = np.asarray(hashing.lookup(table, jnp.asarray(coords[q_idx])))
    np.testing.assert_array_equal(got, q_idx)

    # Absent queries (coords far outside the sampled range)
    absent = _random_coords(rng, 64, d, lo=1000, hi=2000)
    got = np.asarray(hashing.lookup(table, jnp.asarray(absent)))
    np.testing.assert_array_equal(got, -1)

    # Invalid (masked) queries return -1 even if the coords would match
    got = np.asarray(
        hashing.lookup(table, jnp.asarray(coords[q_idx]), query_valid=jnp.zeros(64, bool)))
    np.testing.assert_array_equal(got, -1)


def test_lookup_ignores_padded_table_rows(rng):
    coords = np.zeros((16, 3), np.int32)
    coords[:4] = [[1, 2, 3], [4, 5, 6], [7, 8, 9], [-1, -2, -3]]
    coords[4:] = 77  # garbage in padding region
    table = hashing.build_table(jnp.asarray(coords), jnp.int32(4))
    got = np.asarray(hashing.lookup(table, jnp.asarray([[77, 77, 77], [1, 2, 3]], np.int32)))
    np.testing.assert_array_equal(got, [-1, 0])


@pytest.mark.parametrize("d", [3, 6])
@pytest.mark.parametrize("num", [0, 1, 37, 200])
def test_unique_rows_matches_numpy(rng, d, num):
    n = 200
    coords = _random_coords(rng, n, d, lo=-3, hi=3)  # many duplicates
    uniq, num_unique, src = jax.jit(hashing.unique_rows)(jnp.asarray(coords), jnp.int32(num))
    uniq, num_unique, src = np.asarray(uniq), int(num_unique), np.asarray(src)

    expect = np.unique(coords[:num], axis=0) if num else np.zeros((0, d), np.int32)
    assert num_unique == expect.shape[0]
    np.testing.assert_array_equal(np.sort(uniq[:num_unique], axis=0), np.sort(expect, axis=0))
    # Representative indices point at matching original rows, smallest index each.
    for i in range(num_unique):
        j = src[i]
        assert j < num
        np.testing.assert_array_equal(coords[j], uniq[i])
        matches = np.flatnonzero((coords[:num] == uniq[i]).all(1))
        assert j == matches.min()


def test_unique_rows_batched_vmap(rng):
    coords = rng.randint(-2, 2, size=(4, 64, 3)).astype(np.int32)
    nums = np.array([64, 10, 0, 33], np.int32)
    uniq, num_unique, _ = jax.vmap(hashing.unique_rows)(jnp.asarray(coords), jnp.asarray(nums))
    for b in range(4):
        expect = np.unique(coords[b, : nums[b]], axis=0)
        assert int(num_unique[b]) == expect.shape[0]
