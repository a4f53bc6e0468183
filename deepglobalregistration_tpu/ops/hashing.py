"""Exact coordinate hashing for sparse voxel grids — TPU-native, statically shaped.

This module replaces MinkowskiEngine's C++ coordinate hash maps (the engine behind
``ME.utils.sparse_quantize`` / the coordinate manager; see reference usage at
core/deep_global_registration.py:152,158 and model kernel maps) with a design
that is fully jittable under XLA's static-shape model and fast on TPU:

- Integer coordinate rows are packed *exactly* (no collisions) into a tuple of
  uint32 "key words", 16 bits per coordinate field, lexicographically ordered.
- A ``CoordTable`` is a **bucketed hash table in packed-row form**: each bucket
  owns one contiguous row of ``_PROBE`` slots, each slot holding the key words
  plus the original row index. A lookup gathers that ONE row and compares all
  slots with vector ops.
- Why packed rows: on this TPU, random scalar gathers run ~30x slower per
  element than short contiguous row gathers (measured ~133M elements/s vs
  ~500M rows/s for 32-byte rows — the per-row DMA setup dominates, not bytes).
  The previous layout probed 8 slots x (W words + perm) as ~26 separate scalar
  gathers per query and the 6D kernel-map builds spent ~17 s/pair in them;
  one packed-row gather per query removes ~96% of that. (A 17-round binary
  search is worse still: every round is a *dependent* gather.) With
  ``buckets >= 4 * capacity`` the probability of any bucket exceeding the
  probe window is negligible; the build records an ``overflow`` flag so
  callers can detect the (astronomically rare) violation instead of silently
  missing entries.
- ``unique_rows`` dedups coordinate rows (voxel quantization) via sort + boundary
  detection + cumsum compaction, selecting the *smallest original index* as the
  representative of each voxel (deterministic; ME picks an arbitrary one).

All functions operate on a single cloud of shape [N, D] with a scalar ``num``
count of valid rows (rows >= num are padding). Batch via ``jax.vmap``.

Coordinate range: each field must fit in 16 bits after the +2^15 offset, i.e.
coords in [-32768, 32766]. Out-of-range coordinates are clamped (clamp collisions
then merge distinct voxels — harmless for the shipped voxel sizes: 3DMatch 0.05 m
=> +/-1638 m, KITTI 0.3 m => +/-9830 m scene extent).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-field encoding: value + 2^15 clipped to [0, 2^16 - 2]. The all-ones field
# value (0xFFFF) is reserved so that the all-ones *word* (0xFFFFFFFF) marks padded
# rows, which therefore never match any valid query.
_FIELD_OFFSET = 1 << 15
_FIELD_MAX = (1 << 16) - 2
# numpy (not jnp) so importing this module never initializes a JAX backend —
# on the tunneled platform a dead relay makes backend init hang for minutes.
_PAD_WORD = np.uint32(0xFFFFFFFF)

# Bucket capacity (slots per packed row) and bucket over-provisioning factor.
# With B = 4N buckets (load 0.25/bucket), P(any bucket load > 8) is ~4e-6 even
# at N = 2^17 for a well-mixed hash; the packed-entry table is then
# B * _PROBE * (W+1) uint32 = 64 MB at the largest bucket/6D sizes.
_PROBE = 8
_BUCKET_FACTOR = 4
_MAX_BUCKETS = 1 << 20


def num_words(d: int) -> int:
    """Number of uint32 key words for D coordinate fields (2 fields per word)."""
    return (d + 1) // 2


def pack_cols(cols: Sequence[jnp.ndarray],
              valid: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, ...]:
    """Pack per-dimension coordinate arrays (any common shape) into key words.

    TPU layout note: operating on D separate long arrays keeps the vector lanes
    full; a fused [N, D] layout with D = 3 or 6 in the minor axis wastes
    125/128 of every vector op (measured ~40x slowdowns).
    """
    d = len(cols)
    w = num_words(d)
    fields = [jnp.clip(c.astype(jnp.int32) + _FIELD_OFFSET, 0, _FIELD_MAX).astype(jnp.uint32)
              for c in cols]
    words = []
    for i in range(w):
        hi = fields[2 * i]
        lo = fields[2 * i + 1] if 2 * i + 1 < d else jnp.zeros_like(hi)
        word = (hi << 16) | lo
        if valid is not None:
            word = jnp.where(valid, word, _PAD_WORD)
        words.append(word)
    return tuple(words)


def pack_rows(coords: jnp.ndarray, valid: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, ...]:
    """Pack integer coordinate rows [N, D] into W uint32 key words (each [N]).

    Lexicographic order of the word tuple == lexicographic order of the rows.
    Rows where ``valid`` is False pack to the reserved all-ones pad key.
    """
    d = coords.shape[-1]
    return pack_cols(tuple(coords[..., i] for i in range(d)), valid)


def _lex_eq(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> jnp.ndarray:
    eq = jnp.ones(jnp.broadcast_shapes(a[0].shape, b[0].shape), dtype=bool)
    for aw, bw in zip(a, b):
        eq = eq & (aw == bw)
    return eq


def _mix(words: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Murmur3-style 32-bit mix of the key words (uint32, wrapping arithmetic)."""
    h = jnp.uint32(0x9E3779B9)
    for w in words:
        k = w * jnp.uint32(0xCC9E2D51)
        k = (k << 15) | (k >> 17)
        k = k * jnp.uint32(0x1B873593)
        h = h ^ k
        h = ((h << 13) | (h >> 19)) * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _num_buckets(capacity: int) -> int:
    b = 1
    while b < capacity * _BUCKET_FACTOR and b < _MAX_BUCKETS:
        b <<= 1
    return b


class CoordTable(NamedTuple):
    """Bucketed hash table over a coordinate set, in packed-row form.

    entries:  uint32 [B, _PROBE, W + 1] — per bucket, _PROBE slots of
              (W key words, original row index). Empty slots hold the all-ones
              pad key in every word column, which no valid query can match.
    overflow: bool scalar — True if any bucket holds more than _PROBE entries
              (lookups could then miss; callers should surface this).
    num:      int32 scalar — number of valid rows.
    """

    entries: jnp.ndarray
    overflow: jnp.ndarray
    num: jnp.ndarray


def build_table(coords: jnp.ndarray, num: jnp.ndarray) -> CoordTable:
    """Build the bucketed lookup table from coordinate rows [N, D], ``num`` valid."""
    n = coords.shape[0]
    b = _num_buckets(n)
    valid = jnp.arange(n, dtype=jnp.int32) < num
    words = pack_rows(coords, valid)
    w = len(words)
    bucket = (_mix(words) & jnp.uint32(b - 1)).astype(jnp.int32)
    bucket = jnp.where(valid, bucket, b)  # padding sorts after every real bucket
    idx = jnp.arange(n, dtype=jnp.int32)
    # Same defensive pattern as unique_rows: consume only the sort's permutation
    # output and gather the rest (see XLA:TPU miscompilation note there).
    sorted_ops = jax.lax.sort((bucket,) + tuple(words) + (idx,), num_keys=w + 2)
    s_perm = sorted_ops[-1]
    s_bucket = bucket[s_perm]
    s_words = tuple(ww[s_perm] for ww in words)

    counts = jnp.zeros((b + 1,), jnp.int32).at[s_bucket].add(1, mode="drop")
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[:b])])
    overflow = jnp.max(counts[:b]) > _PROBE
    # Scatter the sorted entries into their (bucket, position) slots of the
    # packed-row table; rows past the probe window (overflow) and padding rows
    # drop out of range.
    pos = idx - starts[jnp.minimum(s_bucket, b)]
    ok = (s_bucket < b) & (pos >= 0) & (pos < _PROBE)
    slot = jnp.where(ok, s_bucket * _PROBE + pos, b * _PROBE)
    payload = jnp.stack(s_words + (s_perm.astype(jnp.uint32),), axis=-1)
    entries = jnp.full((b * _PROBE + 1, w + 1), _PAD_WORD, dtype=jnp.uint32)
    entries = entries.at[slot].set(payload, mode="drop")
    entries = entries[: b * _PROBE].reshape(b, _PROBE, w + 1)
    return CoordTable(entries=entries, overflow=overflow, num=num)


def lookup_words(table: CoordTable, qwords: Tuple[jnp.ndarray, ...],
                 query_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Packed-row lookup of pre-packed query keys (any common shape S).

    Returns original row indices (-1 if absent), shape S. One row gather per
    query fetches the whole bucket (all probe slots + row indices); the slot
    compare is pure vector work (see the module docstring's layout note).
    """
    b, _, wp1 = table.entries.shape
    w = wp1 - 1
    bucket = (_mix(qwords) & jnp.uint32(b - 1)).astype(jnp.int32)
    rows = table.entries[bucket]  # [*S, P, W+1] — the single gather
    eq = jnp.ones(rows.shape[:-1], dtype=bool)
    for i in range(w):
        # Valid queries never pack to the pad key, and empty slots hold the
        # pad key, so equality alone rejects both padding directions.
        eq = eq & (rows[..., i] == qwords[i][..., None])
    if query_valid is not None:
        eq = eq & query_valid[..., None]
    perm = rows[..., w].astype(jnp.int32)
    # At most one slot matches (keys are unique); absent/invalid -> -1.
    return jnp.max(jnp.where(eq, perm, -1), axis=-1)


def lookup_cols(table: CoordTable, query_cols: Sequence[jnp.ndarray],
                query_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Lookup with per-dimension query arrays (lane-friendly hot path)."""
    return lookup_words(table, pack_cols(tuple(query_cols), query_valid), query_valid)


def lookup(table: CoordTable, query_coords: jnp.ndarray,
           query_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Find each query row in the table. Returns original row indices, -1 if absent.

    query_coords: [..., D] int32. Padded/invalid queries (mask False) return -1.
    """
    return lookup_words(table, pack_rows(query_coords, query_valid), query_valid)


def unique_rows(coords: jnp.ndarray, num: jnp.ndarray,
                out_capacity: int | None = None,
                pad_value: int = _FIELD_MAX - _FIELD_OFFSET,
                claim_rounds: int = 3,
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate coordinate rows (the TPU-native ``ME.utils.sparse_quantize``).

    Reference behavior: ME sparse_quantize dedups voxel coords and returns the
    index of one representative point per voxel (deep_global_registration.py:152).
    We deterministically keep the smallest original row index per voxel.

    Algorithm — **scatter-min bucket claiming**, no sort: every row scatter-mins
    its index into a hashed bucket; the winner is the representative of every
    row whose key matches the winner's (rows of one key always share a bucket,
    and scatter-min picks the smallest index). Rows whose bucket was claimed by
    a *different* key (hash collision) retry in a fresh table with a re-mixed
    hash; after ``claim_rounds`` rounds the leftover probability is negligible
    and stragglers become their own representatives (worst case: a duplicate
    coordinate survives — harmless for downstream kernel maps, never data loss).

    This formulation replaces an earlier lexicographic-sort + adjacent-compare
    dedup that was repeatedly miscompiled by the axon TPU backend (jax 0.9.0:
    the boundary comparison of the second packed key word was dropped under
    several fusion patterns, collapsing dedup to (x, y) only). It is also
    faster: 3 scatter/gather waves beat a 3-operand bitonic sort.
    tools/tpu_regression_checks.py guards this on real hardware.

    out_capacity: static size of the output buffers (default: same as input).
    If the number of distinct rows exceeds it, the excess rows are dropped and
    the returned count saturates at out_capacity (callers size capacities so
    this never triggers on real data; padded pyramid levels shrink ~4-8x per
    stride in surface scans).

    Returns (unique_coords [M, D], num_unique scalar, src_index [M] int32):
    rows [0, num_unique) are the distinct valid rows (ordered by original row
    index); src_index[i] is the original row the i-th unique row came from
    (undefined past num_unique; coords there are ``pad_value``).
    """
    n, d = coords.shape
    m = n if out_capacity is None else int(out_capacity)
    b = _num_buckets(n)
    iota = jnp.arange(n, dtype=jnp.int32)
    valid = iota < num
    words = pack_rows(coords, valid)

    rep = jnp.full((n,), -1, jnp.int32)
    unresolved = valid
    for rnd in range(claim_rounds):
        h = _mix(words + (jnp.full((n,), rnd, jnp.uint32),)) & jnp.uint32(b - 1)
        h = jnp.where(unresolved, h.astype(jnp.int32), b)  # resolved/padded rows opt out
        table = jnp.full((b,), n, jnp.int32).at[h].min(iota, mode="drop")
        claimant = table[jnp.minimum(h, b - 1)]
        claimant_c = jnp.minimum(claimant, n - 1)
        same_key = _lex_eq(tuple(w[claimant_c] for w in words), words)
        resolved = unresolved & (claimant < n) & same_key
        rep = jnp.where(resolved, claimant, rep)
        unresolved = unresolved & jnp.logical_not(resolved)
    rep = jnp.where(unresolved, iota, rep)  # stragglers self-represent

    is_rep = valid & (rep == iota)
    pos = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    num_unique = jnp.minimum(jnp.sum(is_rep.astype(jnp.int32)), m)
    tgt = jnp.where(is_rep & (pos < m), pos, m)  # out-of-range -> dropped row m
    out = jnp.full((m + 1, d), pad_value, dtype=coords.dtype)
    out = out.at[tgt].set(coords, mode="drop")
    src = jnp.zeros((m + 1,), dtype=jnp.int32)
    src = src.at[tgt].set(iota, mode="drop")
    return out[:m], num_unique, src[:m]
