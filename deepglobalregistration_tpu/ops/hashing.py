"""Exact coordinate hashing for sparse voxel grids — TPU-native, statically shaped.

This module replaces MinkowskiEngine's C++ coordinate hash maps (the engine behind
``ME.utils.sparse_quantize`` / the coordinate manager; see reference usage at
core/deep_global_registration.py:152,158 and model kernel maps) with a sort-based
design that is fully jittable under XLA's static-shape model:

- Integer coordinate rows are packed *exactly* (no collisions) into a tuple of
  uint32 "key words", 16 bits per coordinate field, lexicographically ordered.
- A "table" over a coordinate set is the lexicographically sorted key words plus
  the sort permutation (``CoordTable``).
- Lookup is a vectorized branch-free binary search (``lookup``): all queries probe
  the sorted table in lockstep, O(log N) gather rounds — the TPU analogue of a
  hash-table probe, but with perfectly coalesced vector lanes.
- ``unique_rows`` dedups coordinate rows (voxel quantization) via sort + boundary
  detection + cumsum compaction, selecting the *smallest original index* as the
  representative of each voxel (deterministic; ME picks an arbitrary one).

All functions operate on a single cloud of shape [N, D] with a scalar ``num`` count
of valid rows (rows >= num are padding). Batch via ``jax.vmap``.

Coordinate range: each field must fit in 16 bits after the +2^15 offset, i.e.
coords in [-32768, 32766]. Out-of-range coordinates are clamped (clamp collisions
then merge distinct voxels — harmless for the shipped voxel sizes: 3DMatch 0.05 m
=> +/-1638 m, KITTI 0.3 m => +/-9830 m scene extent).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

# Per-field encoding: value + 2^15 clipped to [0, 2^16 - 2]. The all-ones field
# value (0xFFFF) is reserved so that the all-ones *word* (0xFFFFFFFF) marks padded
# rows, which therefore sort strictly after every valid row and never match a query.
_FIELD_OFFSET = 1 << 15
_FIELD_MAX = (1 << 16) - 2
_PAD_WORD = jnp.uint32(0xFFFFFFFF)


def num_words(d: int) -> int:
    """Number of uint32 key words for D coordinate fields (2 fields per word)."""
    return (d + 1) // 2


def pack_rows(coords: jnp.ndarray, valid: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, ...]:
    """Pack integer coordinate rows [N, D] into W uint32 key words (each [N]).

    Lexicographic order of the word tuple == lexicographic order of the rows.
    Rows where ``valid`` is False pack to the reserved all-ones pad key.
    """
    n, d = coords.shape
    w = num_words(d)
    fields = jnp.clip(coords.astype(jnp.int32) + _FIELD_OFFSET, 0, _FIELD_MAX).astype(jnp.uint32)
    words = []
    for i in range(w):
        hi = fields[:, 2 * i]
        lo = fields[:, 2 * i + 1] if 2 * i + 1 < d else jnp.zeros_like(hi)
        word = (hi << 16) | lo
        if valid is not None:
            word = jnp.where(valid, word, _PAD_WORD)
        words.append(word)
    return tuple(words)


def _lex_less(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Elementwise lexicographic a < b over tuples of uint32 word arrays."""
    lt = jnp.zeros(a[0].shape, dtype=bool)
    eq = jnp.ones(a[0].shape, dtype=bool)
    for aw, bw in zip(a, b):
        lt = lt | (eq & (aw < bw))
        eq = eq & (aw == bw)
    return lt


def _lex_eq(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> jnp.ndarray:
    eq = jnp.ones(a[0].shape, dtype=bool)
    for aw, bw in zip(a, b):
        eq = eq & (aw == bw)
    return eq


class CoordTable(NamedTuple):
    """Sorted lookup table over a coordinate set.

    words: tuple of W uint32 arrays [N] — lexicographically sorted keys
           (padded rows hold the all-ones pad key and sort last).
    perm:  int32 [N] — original row index of each sorted entry.
    num:   int32 scalar — number of valid rows.
    """

    words: Tuple[jnp.ndarray, ...]
    perm: jnp.ndarray
    num: jnp.ndarray


def build_table(coords: jnp.ndarray, num: jnp.ndarray) -> CoordTable:
    """Build a sorted lookup table from coordinate rows [N, D] with ``num`` valid."""
    n = coords.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < num
    words = pack_rows(coords, valid)
    idx = jnp.arange(n, dtype=jnp.int32)
    # Secondary sort key = original index => stable, deterministic representatives.
    sorted_ops = jax.lax.sort(tuple(words) + (idx,), num_keys=len(words) + 1)
    return CoordTable(words=tuple(sorted_ops[:-1]), perm=sorted_ops[-1], num=num)


def _searchsorted(table_words: Sequence[jnp.ndarray], query_words: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Vectorized lower_bound: first position p with table[p] >= query. [Q] int32."""
    n = table_words[0].shape[0]
    q = query_words[0].shape[0]
    lo = jnp.zeros((q,), dtype=jnp.int32)
    hi = jnp.full((q,), n, dtype=jnp.int32)
    steps = max(1, math.ceil(math.log2(n + 1)))

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        tw = tuple(w[mid] for w in table_words)
        less = _lex_less(tw, query_words)  # table[mid] < query
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def lookup(table: CoordTable, query_coords: jnp.ndarray,
           query_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Find each query row in the table. Returns original row indices, -1 if absent.

    query_coords: [Q, D] int32. Padded/invalid queries (mask False) return -1.
    """
    qwords = pack_rows(query_coords, query_valid)
    pos = _searchsorted(table.words, qwords)
    n = table.words[0].shape[0]
    pos_c = jnp.minimum(pos, n - 1)
    tw = tuple(w[pos_c] for w in table.words)
    # Pad keys are all-ones and valid queries are never all-ones, so equality alone
    # rejects padded table rows; invalid queries were packed to the pad key which
    # never appears among valid table entries.
    found = _lex_eq(tw, qwords) & jnp.logical_not(_lex_eq(qwords, (_PAD_WORD,) * len(qwords)))
    return jnp.where(found, table.perm[pos_c], -1).astype(jnp.int32)


def unique_rows(coords: jnp.ndarray, num: jnp.ndarray,
                pad_value: int = _FIELD_MAX - _FIELD_OFFSET) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate coordinate rows (the TPU-native ``ME.utils.sparse_quantize``).

    Reference behavior: ME sparse_quantize dedups voxel coords and returns the
    index of one representative point per voxel (deep_global_registration.py:152).
    We deterministically keep the smallest original row index per voxel.

    Returns (unique_coords [N, D], num_unique scalar, src_index [N] int32):
    rows [0, num_unique) of unique_coords are the distinct valid rows in
    lexicographic order; src_index[i] is the original row the i-th unique row came
    from (undefined >= num_unique; coords there are ``pad_value``).
    """
    n, d = coords.shape
    table = build_table(coords, num)  # sorted; ties broken by smallest index
    sw = table.words
    iota = jnp.arange(n, dtype=jnp.int32)
    prev = tuple(jnp.concatenate([w[:1] ^ jnp.uint32(1), w[:-1]]) for w in sw)  # force first row "different"
    is_first = jnp.logical_not(_lex_eq(sw, prev))
    # Padded rows sort last, so the first `num` sorted rows are exactly the valid ones.
    is_first = is_first & (iota < num)
    pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_unique = jnp.sum(is_first.astype(jnp.int32))

    sorted_coords = coords[table.perm]
    out = jnp.full((n + 1, d), pad_value, dtype=coords.dtype)
    out = out.at[jnp.where(is_first, pos, n)].set(sorted_coords)
    src = jnp.full((n + 1,), 0, dtype=jnp.int32)
    src = src.at[jnp.where(is_first, pos, n)].set(table.perm)
    return out[:n], num_unique, src[:n]
