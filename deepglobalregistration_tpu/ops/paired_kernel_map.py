"""Fast 6D kernel maps for correspondence grids (the inlier net's level 0).

The 6D inlier net consumes coordinates ``(c0_i, c1_i)`` where c0 enumerates the
*unique* voxel coords of cloud 0 (one correspondence per voxel:
deep_global_registration.py:261, trainer.py:654). A 6D HYPER_CUBE kernel map
at this level asks, for each row i and each offset pair (k0, k1) in
{-1,0,1}^3 x {-1,0,1}^3: "which row j has (c0_j, c1_j) = (c0_i + k0,
c1_i + k1)?" Because c0 is unique per row, the candidate j is determined by
the *3D* query c0_i + k0 alone — one 3D table lookup per (i, k0), then a
cheap comparison of c1_j against the 27 c1 offsets. That turns 729 x N 6D
hash probes into 27 x N 3D lookups + 729 x N vector compares: ~27x less
lookup traffic for the single biggest kernel map in the pipeline.

Deeper pyramid levels lose the uniqueness property after striding — but only
boundedly: after one stride-2, at most 8 level-0 rows (the 2^3 c0 sub-voxels,
each with a unique c1) can share a strided c0. ``PairMultiMap`` generalizes
the trick to multiplicity B: a 3D table over the *distinct* c0 values plus a
packed member matrix [*, B] holding each group's rows WITH their packed c1
and row index, so one row gather per (3D offset, output row) retrieves every
candidate and verifies second halves without further memory traffic. That
replaces the deeper levels' 729-offset 6D hash probes (the round-2 hardware
trace's dominant cost) with 27 3D probes.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from . import hashing


def build_kernel_map_paired(c0: jnp.ndarray, c1: jnp.ndarray, num: jnp.ndarray,
                            offsets: np.ndarray, unit: int = 1) -> jnp.ndarray:
    """Self kernel map of the paired 6D grid (stride-1, level 0).

    c0: [N, 3] unique coords (cloud-0 voxels); c1: [N, 3] matched coords;
    offsets: static [K, 6]; returns [K, N] int32 (-1 = empty site).
    """
    k, d = offsets.shape
    assert d == 6, "paired kernel maps are for 6D correspondence grids"
    n = c0.shape[0]
    offs = np.asarray(offsets) * unit
    # Unique 3D offsets of the first half (27 for a k3 cube; order-preserving
    # grouping so the output K-axis matches the canonical offset enumeration).
    off0, inv0 = np.unique(offs[:, :3], axis=0, return_inverse=True)
    k0n = len(off0)

    table0 = hashing.build_table(c0, num)
    valid = jnp.arange(n, dtype=jnp.int32) < num
    cols0 = tuple(c0[:, i] for i in range(3))
    qcols = tuple(cols0[i][None, :] + jnp.asarray(off0[:, i], jnp.int32)[:, None]
                  for i in range(3))
    qv = jnp.broadcast_to(valid[None, :], (k0n, n))
    # cand[a, i] = row whose c0 equals c0_i + off0[a] (unique if it exists)
    cand = hashing.lookup_cols(table0, qcols, query_valid=qv)  # [k0n, N]
    cand_c = jnp.maximum(cand, 0)
    # c1 of the candidate rows, per second-half dimension: [3][k0n, N]
    c1_cand = tuple(c1[:, i][cand_c] for i in range(3))

    # Expand the k0n candidate rows to all K offsets (static permutation) and
    # verify the second halves in one vectorized compare per dimension.
    inv = jnp.asarray(inv0.astype(np.int32))  # [K] static
    off_d = jnp.asarray(offs, dtype=jnp.int32)
    cand_k = cand[inv]  # [K, N]
    ok = cand_k >= 0
    for i in range(3):
        ok = ok & (c1_cand[i][inv] == c1[:, i][None, :] + off_d[:, 3 + i][:, None])
    return jnp.where(ok, cand_k, -1).astype(jnp.int32)


def build_edge_slots_paired(c0: jnp.ndarray, c1: jnp.ndarray, num: jnp.ndarray,
                            offsets: np.ndarray, unit: int = 1,
                            table0=None, dense_extent=None,
                            log2_stride: int = 0, pad: int = 0):
    """Slot-form edges of the paired 6D self map: (slot_k, slot_in), each
    [S, N] with S = number of distinct first-half 3D offsets (27 for k3).

    Per (3D offset a, row j) there is at most ONE candidate input row (c0 is
    unique), whose kernel-offset index k is decided by the observed second-half
    displacement d1 = c1[cand] - c1[j] via a STATIC (a, d1) -> k table. This
    feeds ops/edge_conv.build_edge_map_from_slots directly — no dense [729, N]
    map and no per-row compaction sort.

    table0: prebuilt c0 lookup table (hash CoordTable or dense-grid
    DenseTable) — level 0's unique c0 means the level-0 multimap's table is
    exactly this probe's table, so the caller shares one build. dense_extent/
    log2_stride select the dense probe (one int32 gather per query vs the
    hash path's packed-bucket row gather — measured ~2.5x on chip).
    """
    k, d = offsets.shape
    assert d == 6
    n = c0.shape[0]
    offs = np.asarray(offsets) * unit
    off0, lo1, box, tab = _split_offset_tables(offs, unit)
    k0n = len(off0)

    if table0 is None:
        table0 = hashing.build_table(c0, num)
    valid = jnp.arange(n, dtype=jnp.int32) < num
    cand = _group_lookup_offsets(table0, c0, valid, off0, unit,
                                 dense_extent, log2_stride, pad)  # [k0n, N]
    cand_c = jnp.maximum(cand, 0)

    # boxed second-half displacement of each candidate
    pidx = jnp.zeros((k0n, n), jnp.int32)
    in_box = cand >= 0
    mult = 1
    for i in range(3):
        di = c1[:, i][cand_c] - c1[:, i][None, :] - int(lo1[i])
        qi, ri = di // unit, di % unit
        in_box = in_box & (ri == 0) & (qi >= 0) & (qi < int(box[i]))
        pidx = pidx + mult * jnp.clip(qi, 0, int(box[i]) - 1)
        mult *= int(box[i])
    slot_k = _apply_k_table(tab, pidx, in_box)
    slot_in = jnp.where(slot_k >= 0, cand, -1)
    return slot_k.astype(jnp.int32), slot_in.astype(jnp.int32)


def _apply_k_table(tab: np.ndarray, pidx: jnp.ndarray,
                   in_box: jnp.ndarray) -> jnp.ndarray:
    """Vectorized ``tab[a, pidx]`` (a = leading axis of pidx) WITHOUT an
    element gather — scalar gathers run ~120M elem/s on this TPU, and this
    lookup is issued for every (offset, output row, member slot).

    HYPER_CUBE tables are affine (offsets enumerate dimension 0 fastest, so
    k = first-half digit value + stride * boxed second-half index) — pure
    arithmetic. Sparse tables (HYPER_CROSS) use a one-hot matmul against the
    tiny static table instead."""
    a_n, p_n = tab.shape
    base = tab[:, 0].astype(np.int32)
    lead = (a_n,) + (1,) * (pidx.ndim - 1)
    if p_n == 1:
        k = jnp.broadcast_to(jnp.asarray(base).reshape(lead), pidx.shape)
    else:
        stride = int(tab[0, 1]) - int(tab[0, 0])
        if tab.min() >= 0 and np.array_equal(
                tab, base[:, None] + stride * np.arange(p_n)[None, :]):
            k = jnp.asarray(base).reshape(lead) + stride * pidx
        else:
            # Base-256 digits: TPU einsums multiply in bf16 (integers > 256
            # round), so the table values ride the matmul one exact digit at
            # a time (see edge_conv._rank_compact).
            oh = jax.nn.one_hot(pidx, p_n, dtype=jnp.float32)
            enc = (tab + 1).astype(np.int64)
            lo = jnp.asarray((enc & 0xFF).astype(np.float32))
            hi = jnp.asarray(((enc >> 8) & 0xFF).astype(np.float32))
            klo = jnp.einsum("a...p,ap->a...", oh, lo).astype(jnp.int32)
            khi = jnp.einsum("a...p,ap->a...", oh, hi).astype(jnp.int32)
            k = klo + (khi << 8) - 1
    return jnp.where(in_box, k, -1)


def _split_offset_tables(offs: np.ndarray, unit: int):
    """Static tables splitting pre-scaled [K, 6] offsets by their 3D halves.

    Returns (off0 [A, 3] distinct first-half offsets, lo1 [3] second-half
    minimum, box [3] second-half extent in units, tab [A, prod(box)] mapping
    (first-half index, boxed second-half displacement) -> canonical offset
    index k, -1 where no offset exists)."""
    k = offs.shape[0]
    off0, inv0 = np.unique(offs[:, :3], axis=0, return_inverse=True)
    lo1 = offs[:, 3:].min(axis=0)
    box = (offs[:, 3:].max(axis=0) - lo1) // unit + 1
    tab = np.full((len(off0), int(box[0] * box[1] * box[2])), -1, np.int32)
    for kk in range(k):
        p = (offs[kk, 3:] - lo1) // unit
        tab[inv0[kk], int(p[0] + box[0] * (p[1] + box[1] * p[2]))] = kk
    return off0, lo1, box, tab


class PairMultiMap(NamedTuple):
    """3D-keyed bounded multimap over a 6D correspondence grid's rows.

    For distinct-c0 group g (indexed by the representative's original row, as
    returned by table lookups), up to B member rows. Structure-of-arrays: one
    [N, B] array per field, so each field gathers as a CONTIGUOUS row (an
    interleaved [N, B, 3] layout made XLA decompose the gather into strided
    per-column scalar gathers — ~10x slower on this TPU).

    table:     hash table over the DISTINCT first-half (c0) coordinates —
               OR a dense-grid index (ops/dense_grid.DenseTable) when the
               builder was given a bounded extent: the per-query cost then
               drops from one packed-bucket row gather (8 slots x 3 words)
               to a single int32 element gather, the dominant plan-build
               cost measured on chip.
    members:   uint32 [N, 3*B] — per group, B member slots of (c1 word0,
               c1 word1, row index) packed as ONE contiguous row so a probe
               costs a single row gather (separate per-field arrays tripled
               the row-gather count; an interleaved [N, B, 3] layout made
               XLA decompose the gather into strided per-column scalar
               gathers — both measured slower on chip). Empty slots hold the
               all-ones pad word (which doubles as row index -1).
    overflow:  bool — some c0 group has more than B rows (edges dropped).
    """

    table: object
    members: jnp.ndarray
    overflow: jnp.ndarray


def _group_lookup(table, qcols, qv, extent, log2_stride):
    """Group-id lookup dispatching on the multimap's key structure."""
    from . import dense_grid

    if isinstance(table, dense_grid.DenseTable):
        return dense_grid.dense_lookup_cols(table, extent, log2_stride,
                                            qcols, query_valid=qv)
    return hashing.lookup_cols(table, qcols, query_valid=qv)


def _lex_cube_ks(off0: np.ndarray, unit: int) -> int:
    """ks if off0/unit enumerates a full odd cube in LEXICOGRAPHIC order (the
    np.unique order _split_offset_tables produces), else 0."""
    a = np.asarray(off0)
    ks = round(len(a) ** (1 / 3))
    if ks ** 3 != len(a) or ks % 2 == 0 or np.any(a % unit):
        return 0
    r = ks // 2
    d = np.arange(-r, r + 1)
    cube = np.stack(np.meshgrid(d, d, d, indexing="ij"), -1).reshape(-1, 3)
    return ks if np.array_equal(a // unit, cube) else 0


def _group_lookup_offsets(table, coords3, valid, off0, unit, extent,
                          log2_stride, pad, margin=0):
    """[A, M] group-id lookups at coords3 + off0[a], one per (offset, row).

    When the table is a padded dense grid and off0 is a full cube, ALL A
    lookups for a row ride ONE patch gather index (ops/dense_grid
    .patch_lookup_cube) — the per-index gather wall makes this ~A x cheaper
    than the per-offset form. margin: how far below the table's data region
    a query CENTER can sit (0 when coords3 are the table's own rows, 1 when
    they come from a floor-strided coarser grid); the patch needs pad >=
    ks//2 + margin to fit around border centers."""
    from . import dense_grid

    a_n = len(off0)
    n = coords3.shape[0]
    if isinstance(table, dense_grid.DenseTable) and unit == (1 << log2_stride):
        ks = _lex_cube_ks(off0, unit)
        if ks and pad >= ks // 2 + margin and dense_grid.PATCH_GATHER:
            return dense_grid.patch_lookup_cube(
                table, extent, log2_stride, coords3, valid, ks, pad)
    qcols = tuple(coords3[:, i][None, :]
                  + jnp.asarray(off0[:, i], jnp.int32)[:, None]
                  for i in range(3))
    qv = jnp.broadcast_to(valid[None, :], (a_n, n))
    return _group_lookup(table, qcols, qv, extent, log2_stride)


def build_multimap(c0: jnp.ndarray, c1: jnp.ndarray, num: jnp.ndarray,
                   b_slots: int, dense_extent=None,
                   log2_stride: int = 0, pad: int = 0,
                   dense_members: bool = False) -> PairMultiMap:
    """Group the rows of a 6D correspondence grid by their 3D c0 value.

    One stride-2 of a level with unique c0 yields groups of <= 8, so b_slots
    = 8 is exact at level 1; deeper levels use a configured cap with the
    overflow flag (the edge-conv d_cap would bound per-row degree anyway).

    dense_extent: static [X, Y, Z] cell box (at this level's stride
    granularity) switching the c0 key to the dense-grid index.
    dense_members: lay the member matrix out SPATIALLY — one [3*b_slots] row
    per dense CELL instead of per grid row. A probe then fetches the member
    rows of a whole 3^3 offset neighborhood under ONE gather index
    (edge_slots_from_multimap dense_members path), eliminating both the
    group-id lookup and the per-(offset, row) member row gathers — the two
    remaining per-index gather costs of the deep-level plan builds. Costs
    cells*3*b_slots words of transient HBM (the caller bounds it)."""
    n = c0.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    valid = iota < num
    assert not (dense_members and dense_extent is None), \
        "dense_members requires a dense-grid key"
    if dense_extent is not None:
        from . import dense_grid
        from .sparse_grid import Grid

        # Group id := the group's SMALLEST row index, scattered directly by
        # the min-reducing dense build — no unique_rows pass, no hash table
        # (their claim-round scatters were ~21 ms/pair on chip). Member
        # layout/probing is group-id-agnostic (any consistent id < n works).
        table = dense_grid.build_dense_table(
            Grid(coords=c0, num=num), dense_extent,
            log2_stride=log2_stride, reduce="min", pad=pad)
        g = dense_grid.dense_lookup_cols(
            table, dense_grid.padded_extent(dense_extent, pad), log2_stride,
            tuple(c0[:, i] for i in range(3)), query_valid=valid)
    else:
        u_coords, u_num, _ = hashing.unique_rows(c0, num)
        table = hashing.build_table(u_coords, u_num)
        # Group id := position of the row's c0 among the distinct values.
        # Every valid row's c0 is present by construction, so g >= 0 for
        # valid rows.
        g = hashing.lookup(table, c0, query_valid=valid)
    # g == -1 happens only on the dense-key path for rows outside the box
    # (the dense table's overflow flag is raised); exclude them like padding.
    gq = jnp.where(valid & (g >= 0), g, n)
    # Rank rows within their group by original index (deterministic member
    # order). Consume only the sort's permutation output (see unique_rows).
    s_idx = jax.lax.sort((gq, iota), num_keys=2)[-1]
    s_g = gq[s_idx]
    counts = jnp.zeros((n + 1,), jnp.int32).at[s_g].add(1, mode="drop")
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts[:n])])
    pos = iota - starts[jnp.minimum(s_g, n)]
    ok = (s_g < n) & (pos >= 0) & (pos < b_slots)
    c1w = hashing.pack_rows(c1, valid)

    # One packed [*, 3, B] row per group (fields: c1 word0, c1 word1, row
    # index) so a probe gathers its ~100 contiguous words ONCE — three
    # separate [N, B] gathers tripled the row-gather count, the measured
    # cost driver of the deep-level plan build. dense_members keys the row
    # by the group's CELL ADDRESS (spatial layout) instead of its group id.
    if dense_members:
        from . import dense_grid

        ex, ey, ez = dense_grid.padded_extent(dense_extent, pad)
        rel = [(c0[:, i] - table.cmin[i]) >> log2_stride for i in range(3)]
        inb = ((rel[0] >= 0) & (rel[0] < ex) & (rel[1] >= 0) & (rel[1] < ey)
               & (rel[2] >= 0) & (rel[2] < ez))
        addr = (rel[0] * ey + rel[1]) * ez + rel[2]
        rows_total = ex * ey * ez
        key = jnp.where(inb[s_idx], addr[s_idx], rows_total)
    else:
        rows_total = n
        key = s_g
    flat = jnp.full((rows_total * 3 * b_slots + 3,), hashing._PAD_WORD,
                    jnp.uint32)
    base = jnp.where(ok & (key < rows_total), key * 3 * b_slots + pos,
                     rows_total * 3 * b_slots)
    flat = flat.at[base].set(c1w[0][s_idx], mode="drop")
    flat = flat.at[base + b_slots].set(c1w[1][s_idx], mode="drop")
    flat = flat.at[base + 2 * b_slots].set(
        s_idx.astype(jnp.uint32), mode="drop")
    members = flat[: rows_total * 3 * b_slots].reshape(rows_total,
                                                       3 * b_slots)
    overflow = (jnp.max(counts[:n]) > b_slots) | table.overflow
    return PairMultiMap(table=table, members=members, overflow=overflow)


def edge_slots_from_multimap(mm: PairMultiMap, c0_out: jnp.ndarray,
                             c1_out: jnp.ndarray, num_out: jnp.ndarray,
                             offsets: np.ndarray, unit: int,
                             dense_extent=None, log2_stride: int = 0,
                             group_cap: int | None = None, pad: int = 0,
                             probe_margin: int = 0,
                             dense_members: bool = False):
    """Slot-form edges (slot_k, slot_in, overflow), maps [A*B, M], of the
    kernel map whose INPUT rows are the multimap's grid and whose OUTPUT rows
    are the (c0_out, c1_out) grid: input i is reachable from output j under
    offset k when coords_in_i = coords_out_j + offsets[k] * unit.

    Per (distinct first-half offset a, output row j): one 3D table probe finds
    the input c0 group, one member-row gather retrieves <= B candidates with
    their packed c1, and the kernel-offset index comes from the static
    (a, boxed second-half displacement) table. Feed the result to
    ops/edge_conv.build_edge_map_from_slots / build_edge_maps_down_up_from_slots.

    group_cap: compact each (a, j)'s B member slots to its first group_cap
    VERIFIED edges before flattening (edge_conv.compact_slots_grouped) — the
    downstream per-row d_cap compaction then runs over A*group_cap instead of
    A*B slots. Beyond-cap edges drop with the overflow flag. None (or
    >= B) = no group compaction (overflow stays False)."""
    offs = np.asarray(offsets) * unit
    off0, lo1, box, tab = _split_offset_tables(offs, unit)
    a_n = len(off0)
    b_slots = mm.members.shape[1] // 3
    m = c0_out.shape[0]
    validq = jnp.arange(m, dtype=jnp.int32) < num_out

    if dense_members:
        from . import dense_grid

        ks = _lex_cube_ks(off0, unit)
        assert ks and unit == (1 << log2_stride) and pad >= ks // 2 + \
            probe_margin, "dense_members probe needs a cube + enough pad"
        # The member rows of a row's whole offset neighborhood under ONE
        # gather index — no group-id lookup, no per-(offset, row) row gather.
        rows = dense_grid.patch_member_rows(
            mm.members, mm.table, dense_extent, log2_stride, c0_out, validq,
            ks, pad, jnp.uint32(hashing._PAD_WORD))  # [A, M, 3B]
        w0 = rows[..., :b_slots]
        w1 = rows[..., b_slots:2 * b_slots]
        ridx = rows[..., 2 * b_slots:].astype(jnp.int32)  # pad -> -1
        present = w0 != hashing._PAD_WORD
    else:
        g = _group_lookup_offsets(mm.table, c0_out, validq, off0, unit,
                                  dense_extent, log2_stride, pad,
                                  margin=probe_margin)  # [A, M]
        gc = jnp.maximum(g, 0)
        rows = mm.members[gc]  # [A, M, 3B] — ONE row gather (PairMultiMap)
        w0 = rows[..., :b_slots]
        w1 = rows[..., b_slots:2 * b_slots]
        ridx = rows[..., 2 * b_slots:].astype(jnp.int32)  # pad word -> -1
        present = (g >= 0)[..., None] & (w0 != hashing._PAD_WORD)

    # unpack the members' c1 fields (16-bit packed, see hashing.pack_cols)
    f_off = hashing._FIELD_OFFSET
    c1m = ((w0 >> 16).astype(jnp.int32) - f_off,
           (w0 & jnp.uint32(0xFFFF)).astype(jnp.int32) - f_off,
           (w1 >> 16).astype(jnp.int32) - f_off)
    in_box = present
    pidx = jnp.zeros_like(ridx)
    mult = 1
    for i in range(3):
        di = c1m[i] - c1_out[:, i][None, :, None] - int(lo1[i])
        qi, ri = di // unit, di % unit
        in_box = in_box & (ri == 0) & (qi >= 0) & (qi < int(box[i]))
        pidx = pidx + mult * jnp.clip(qi, 0, int(box[i]) - 1)
        mult *= int(box[i])
    slot_k = _apply_k_table(tab, pidx, in_box)  # [A, M, B]
    slot_in = jnp.where(slot_k >= 0, ridx, -1)
    overflow = jnp.asarray(False)
    if group_cap is not None and group_cap < b_slots:
        from . import edge_conv

        slot_k, slot_in, overflow = edge_conv.compact_slots_grouped(
            slot_k, slot_in, group_cap)
        b_slots = group_cap
    slot_k = jnp.moveaxis(slot_k, -1, 1).reshape(a_n * b_slots, m)
    slot_in = jnp.moveaxis(slot_in, -1, 1).reshape(a_n * b_slots, m)
    return slot_k.astype(jnp.int32), slot_in.astype(jnp.int32), overflow
