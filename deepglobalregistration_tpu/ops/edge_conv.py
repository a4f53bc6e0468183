"""Edge-compacted sparse convolution — FLOPs proportional to ACTUAL edges.

The dense kernel-map formulation (ops/sparse_conv.py) computes K gather-GEMMs
of [M, Cin] x [Cin, Cout] regardless of how many kernel-map entries are valid:
for the 6D inlier net (K = 3^6 = 729) on correspondence grids, rows have at
most ~27 in-edges (c0 is unique per row, so each 3D c0-offset pins a single
candidate), meaning >96% of the dense compute multiplies zeros. MinkowskiEngine
only ever computes the actual in/out pairs (its kernel maps are variable-length
vectors per offset); this module is the static-shape TPU equivalent:

1. compact: per output row, gather its valid (offset k, input row i) pairs
   into ``d_cap`` slots (stable argsort over the kmap column validity);
2. bin: globally sort the E = M * d_cap edge slots by k, pad each offset's
   bin to a multiple of the tile size T so every tile touches ONE offset;
3. compute: scan over chunks of tiles — gather [T, Cin] activations, batched
   einsum against the per-tile kernel slice [Cin, Cout], scatter-add into the
   output — skipping chunks whose tiles are all padding (lax.cond executes
   one branch on TPU, so empty chunks cost a scalar test).

FLOPs drop from K*M*Cin*Cout to ~E_valid*Cin*Cout (plus <= K*T tile padding),
a 25-150x reduction for the 6D net. Exact edge coverage: verified against
sparse_conv to f32 accumulation-order tolerance in tests/test_edge_conv.py.

Overflow: rows with more than d_cap valid offsets lose edges; the build
records an ``overflow`` flag (same contract as the hash/dense tables — callers
surface it; see models/unet_plan.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class EdgeMap(NamedTuple):
    """Tile-blocked edge list for one convolution site.

    tile_in:  [NT, T] int32 input row per edge (-1 = padding)
    tile_out: [NT, T] int32 output row per edge (-1 = padding)
    tile_k:   [NT] int32 kernel offset of every edge in the tile (-1 = padding
              tile; tiles never mix offsets)
    overflow: bool — some row had more than d_cap valid offsets (edges lost)
    out_slots: int32 [M_pad, D] or None — for maps whose edge list has a
              static per-output-row slot pattern (everything except
              transposed maps), the flat tile positions of each output row's
              edges: FRONT-PACKED per row (-1 tail) and rows DEGREE-SORTED
              descending. The convolution composes its output by GATHERING
              per-edge products (the scatter-add it replaces measured ~10x
              the rest of the conv), and the degree sort lets it gather each
              row at roughly its own degree instead of the worst-case cap D:
              rows are processed in contiguous degree tiers of static widths
              (_tier_widths) with DYNAMIC chunk bounds (tier_bounds), so
              gather cost tracks live edges. The flat [M_pad, D] slot gather
              this replaces ran at the bench shape's caps-x-capacity product
              (~2G elements, ~380 ms/pair) even when 97% of slots were empty.
    row_inv:  int32 [M] or None — original row -> its position in the degree
              sort (acc[row_inv] unsorts the output).
    tier_bounds: int32 [T+1] or None — tier t (width _tier_widths(D)[t])
              covers sorted rows [tier_bounds[t+1], tier_bounds[t]);
              tier_bounds[0] = #rows with degree > 0 (all-zero rows are never
              touched), tier_bounds[T] = 0.
    """

    tile_in: jnp.ndarray
    tile_out: jnp.ndarray
    tile_k: jnp.ndarray
    overflow: jnp.ndarray
    out_slots: jnp.ndarray | None = None
    row_inv: jnp.ndarray | None = None
    tier_bounds: jnp.ndarray | None = None

    @property
    def tile(self) -> int:
        return self.tile_in.shape[1]


def build_edge_map(kmap: jnp.ndarray, d_cap: int, tile: int = 128,
                   live_cap: int | None = None) -> EdgeMap:
    """Convert a dense kernel map idx[K, M] into a tile-blocked edge list.

    d_cap: static per-row edge capacity (27 is exact for paired 6D level-0
    maps; deeper levels use a configured cap with the overflow flag).
    live_cap: total live-edge budget in slots (see _edges_to_tiles).
    """
    edge_k, edge_in, edge_out, k_total, tile_sz, overflow = _compact_edges(
        kmap, d_cap, tile)
    m = kmap.shape[1]
    return _edges_to_tiles(edge_k, edge_in, edge_out, k_total, tile_sz,
                           overflow, slot_shape=(m, edge_k.shape[0] // m),
                           live_cap=live_cap)


def build_edge_maps_down_up(kmap_down: jnp.ndarray, d_cap: int,
                            tile: int = 128,
                            live_cap: int | None = None) -> tuple:
    """(down, up) edge maps from ONE dense strided kernel map.

    A transposed convolution's map is the SAME edge set with input and output
    exchanged: forward down edge (offset k, in=fine j, out=coarse p) means
    c_fine_j = c_coarse_p + off_k * unit, which is exactly the transpose
    query c_coarse_p = c_fine_j - off_k * unit (ops/kernel_map.py transpose
    sign flip) for the up edge (k, in=p, out=j). Deriving the up map here
    replaces its entire 729-offset hash build with one re-tiling pass."""
    edge_k, edge_in, edge_out, k_total, tile_sz, overflow = _compact_edges(
        kmap_down, d_cap, tile)
    m = kmap_down.shape[1]
    down = _edges_to_tiles(edge_k, edge_in, edge_out, k_total, tile_sz,
                           overflow, slot_shape=(m, edge_k.shape[0] // m),
                           live_cap=live_cap)
    up = _edges_to_tiles(edge_k, edge_out, edge_in, k_total, tile_sz,
                         overflow, live_cap=live_cap)
    return down, up


def _rank_compact(kt_vals: jnp.ndarray, it_vals: jnp.ndarray,
                  valid: jnp.ndarray, k_total: int, d_cap: int):
    """Per-row top-d_cap compaction of [M, S] (kernel-offset, input-row) value
    pairs via a one-hot MATMUL over the cumsum rank.

    A scatter into [M, d_cap] runs at this TPU's scalar scatter rate (~200M
    updates/s — 65 ms per map at multimap scale); the same permutation as
    einsum('ms,msd->md') against a rank one-hot rides the MXU and measured
    ~15x faster. Exact: values are encoded +1 (0 = empty) and stay below
    2^24, each output column receives at most one nonzero contribution (ranks
    are unique per row), so f32 accumulation never rounds.

    Wide maps accumulate over S in chunks: XLA fuses the rank one-hot into
    the einsum but MATERIALIZES the [M, 5, S] digit stack — at multimap
    training scale ([2, 32768, 5, 3456] bf16) that one temp is 2.1 GB and
    OOMed the 32768-bucket inlier train step on v5e (16.25/15.75 GB HBM).
    Chunk partials land in disjoint output columns (ranks are unique across
    the whole row), so f32 accumulation across chunks stays exact."""
    m, s = kt_vals.shape
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    overflow = jnp.any(jnp.sum(valid, axis=1) > d_cap)
    tgt = jnp.where(valid & (rank < d_cap), rank, d_cap)  # d_cap = spill slot
    # Values ride the matmul as BASE-256 DIGITS: TPU einsums multiply in
    # bf16 by default, which rounds integers above 256 — carrying raw row
    # indices corrupted edges by +-1 on hardware (caught by
    # tools/tpu_regression_checks.py; exact on CPU f32). Each digit is
    # <= 255 (bf16-exact), the one-hot is 0/1, and every output column
    # receives at most one nonzero contribution, so f32 accumulation is
    # exact.
    kv = jnp.where(valid, kt_vals + 1, 0)
    iv = jnp.where(valid, it_vals + 1, 0)
    pk, pi = _rank_take(kv, iv, tgt, d_cap)
    edge_k = jnp.where(pk > 0, pk - 1, k_total).astype(jnp.int32)
    edge_in = (pi - 1).astype(jnp.int32)  # empty -> -1
    edge_k = jnp.where(edge_in >= 0, edge_k, k_total)
    edge_out = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None],
                                (m, d_cap))
    return (edge_k.reshape(-1), edge_in.reshape(-1), edge_out.reshape(-1),
            overflow)


def _rank_take(kv: jnp.ndarray, iv: jnp.ndarray, tgt: jnp.ndarray,
               d_cap: int):
    """Permute encoded value pairs [R, S] into their rank slots [R, d_cap]
    via the digit matmul (see _rank_compact for the exactness argument).
    kv/iv are +1-encoded (0 = empty, kv < 2^16, iv < 2^24); tgt holds each
    slot's destination column with d_cap acting as the discard slot.
    Returns (pk, pi) int32 [R, d_cap], still +1-encoded."""
    m, s = kv.shape

    def digit_pack(kv_c, iv_c, tgt_c):
        onehot = jax.nn.one_hot(tgt_c, d_cap + 1, dtype=jnp.float32)
        vals = jnp.stack([
            (kv_c & 0xFF).astype(jnp.float32),
            ((kv_c >> 8) & 0xFF).astype(jnp.float32),
            (iv_c & 0xFF).astype(jnp.float32),
            ((iv_c >> 8) & 0xFF).astype(jnp.float32),
            ((iv_c >> 16) & 0xFF).astype(jnp.float32),
        ], axis=1)  # [M, 5, s_chunk]
        return jnp.einsum("mcs,msd->mcd", vals, onehot)

    s_chunk = 1024
    if s <= s_chunk:
        packed = digit_pack(kv, iv, tgt)[..., :d_cap]
    else:
        n_chunks = -(-s // s_chunk)
        pad = n_chunks * s_chunk - s
        # padding ranks to the spill slot keeps pad lanes out of [0, d_cap)
        kv_t = jnp.pad(kv, ((0, 0), (0, pad))).reshape(m, n_chunks, s_chunk)
        iv_t = jnp.pad(iv, ((0, 0), (0, pad))).reshape(m, n_chunks, s_chunk)
        tgt_t = jnp.pad(tgt, ((0, 0), (0, pad)),
                        constant_values=d_cap).reshape(m, n_chunks, s_chunk)

        def body(acc, inp):
            kv_c, iv_c, tgt_c = inp
            return acc + digit_pack(kv_c, iv_c, tgt_c), None

        packed, _ = jax.lax.scan(
            body, jnp.zeros((m, 5, d_cap + 1), jnp.float32),
            (jnp.moveaxis(kv_t, 1, 0), jnp.moveaxis(iv_t, 1, 0),
             jnp.moveaxis(tgt_t, 1, 0)))
        packed = packed[..., :d_cap]
    dig = packed.astype(jnp.int32)
    pk = dig[:, 0] + (dig[:, 1] << 8)
    pi = dig[:, 2] + (dig[:, 3] << 8) + (dig[:, 4] << 16)
    return pk, pi


def compact_slots_grouped(slot_k: jnp.ndarray, slot_in: jnp.ndarray,
                          cap: int):
    """Per-(offset-group, output-row) compaction of slot-form maps:
    [A, M, B] -> [A, M, cap], keeping each (a, j)'s first `cap` edges.

    The multimap probe (ops/paired_kernel_map.edge_slots_from_multimap)
    yields B candidate member slots per (3D offset a, output row j), but the
    VERIFIED count per (a, j) is tiny — max 4/10/20 at levels 1/2/3 on the
    pinned trained-matching bench grids (tools/per_offset_hits.py) versus
    member caps B = 8/64/128. Compacting along B first shrinks the slot form
    the expensive per-row d_cap compaction consumes by B/cap (4-5.3x at
    bench shape), which is where ~40% of the 6D plan-build device time went
    (r5 trace: edge_conv one-hot einsums 110 ms of the 474 ms pair total).
    Beyond-cap edges drop with the overflow flag raised, mirroring every
    other cap in this module."""
    a, m, b = slot_k.shape
    valid = (slot_k >= 0) & (slot_in >= 0)
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    overflow = jnp.any(jnp.sum(valid, axis=-1) > cap)
    tgt = jnp.where(valid & (rank < cap), rank, cap)
    kv = jnp.where(valid, slot_k + 1, 0)
    iv = jnp.where(valid, slot_in + 1, 0)
    pk, pi = _rank_take(kv.reshape(a * m, b), iv.reshape(a * m, b),
                        tgt.reshape(a * m, b), cap)
    si = (pi - 1).astype(jnp.int32).reshape(a, m, cap)
    sk = (pk - 1).astype(jnp.int32).reshape(a, m, cap)
    return jnp.where(si >= 0, sk, -1), si, overflow


def _compact_edges(kmap: jnp.ndarray, d_cap: int, tile: int):
    """Dense kmap [K, M] -> flat edge triples (k, in, out), invalid edges
    carrying k = K; per-output-row degree capped at d_cap (overflow flag)."""
    k_total, m = kmap.shape
    d_cap = min(d_cap, k_total)
    kt = kmap.T  # [M, K]
    valid = kt >= 0
    ks = jax.lax.broadcasted_iota(jnp.int32, kt.shape, 1)
    edge_k, edge_in, edge_out, overflow = _rank_compact(
        ks, kt, valid, k_total, d_cap)
    return edge_k, edge_in, edge_out, k_total, tile, overflow


def _compact_slot_edges(slot_k: jnp.ndarray, slot_in: jnp.ndarray,
                        k_total: int, d_cap: int):
    """Compact slot-form maps [S, M] to d_cap edges per output row (see
    _rank_compact); returns flat edge triples."""
    kt = slot_k.T  # [M, S]
    it = slot_in.T
    valid = (kt >= 0) & (it >= 0)
    return _rank_compact(kt, it, valid, k_total, d_cap)


def build_edge_map_from_slots(slot_k: jnp.ndarray, slot_in: jnp.ndarray,
                              k_total: int, tile: int = 128,
                              d_cap: int | None = None,
                              live_cap: int | None = None) -> EdgeMap:
    """Build the tile-blocked edge list from slot-form maps [S, M]: slot_k is
    the kernel-offset index per (slot, output row) and slot_in the input row
    (-1 in either = no edge). Used by the paired/multimap 6D builders, which
    know each row's candidate edges directly — no dense [K, M] map.

    d_cap: compact to at most d_cap edges per output row first (multimap
    slots are A*B wide and mostly empty; compaction keeps the edge sort at
    M*d_cap elements). None or d_cap >= S skips compaction."""
    s, m = slot_k.shape
    if d_cap is not None and d_cap < s:
        edge_k, edge_in, edge_out, overflow = _compact_slot_edges(
            slot_k, slot_in, k_total, d_cap)
        return _edges_to_tiles(edge_k, edge_in, edge_out, k_total, tile,
                               overflow, slot_shape=(m, d_cap),
                               live_cap=live_cap)
    valid = (slot_k >= 0) & (slot_in >= 0)
    edge_k = jnp.where(valid, slot_k, k_total)
    edge_out = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (s, m))
    return _edges_to_tiles(edge_k.reshape(-1), slot_in.reshape(-1),
                           edge_out.reshape(-1), k_total, tile,
                           jnp.asarray(False), slot_shape=(s, m),
                           transpose_slots=True, live_cap=live_cap)


def build_edge_maps_down_up_from_slots(slot_k: jnp.ndarray,
                                       slot_in: jnp.ndarray, k_total: int,
                                       tile: int = 128,
                                       d_cap: int | None = None,
                                       live_cap: int | None = None) -> tuple:
    """(down, up) edge maps from slot-form maps of the strided DOWN conv
    (outputs = coarse rows). The up map is the same edge set with input and
    output exchanged (see build_edge_maps_down_up)."""
    s, m = slot_k.shape
    if d_cap is not None and d_cap < s:
        edge_k, edge_in, edge_out, overflow = _compact_slot_edges(
            slot_k, slot_in, k_total, d_cap)
        shape, tr = (m, d_cap), False
    else:
        valid = (slot_k >= 0) & (slot_in >= 0)
        edge_k = jnp.where(valid, slot_k, k_total).reshape(-1)
        edge_in = slot_in.reshape(-1)
        edge_out = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.int32)[None, :], (s, m)).reshape(-1)
        overflow = jnp.asarray(False)
        shape, tr = (s, m), True
    edge_in = jnp.where(edge_k < k_total, edge_in, -1)
    down = _edges_to_tiles(edge_k, edge_in, edge_out, k_total, tile, overflow,
                           slot_shape=shape, transpose_slots=tr,
                           live_cap=live_cap)
    up = _edges_to_tiles(edge_k, edge_out, edge_in, k_total, tile, overflow,
                         live_cap=live_cap)
    return down, up


def _edges_to_tiles(edge_k: jnp.ndarray, edge_in: jnp.ndarray,
                    edge_out: jnp.ndarray, k_total: int, tile: int,
                    overflow: jnp.ndarray, slot_shape=None,
                    transpose_slots: bool = False,
                    live_cap: int | None = None) -> EdgeMap:
    """Sort edges by offset, pad each offset's bin to a tile multiple, and
    scatter into single-offset tiles. Invalid edges carry k = k_total (a dummy
    trailing bin whose tiles stay marked -1 and are skipped at compute).

    slot_shape: when the INCOMING flat edge order has a static per-output-row
    pattern (row-major [M, D], or [S, M] with transpose_slots=True), also
    compute EdgeMap.out_slots — the tile position of every incoming edge,
    recovered by a second cheap sort — enabling the gather-sum convolution.

    live_cap: static budget (in edge slots, rounded up to whole tiles) for
    the tile buffers. The per-row cap (d_cap) bounds each ROW's degree; this
    bounds the map's TOTAL live edges, which is what actually sizes the
    product buffers: without it they span all M*d_cap slots even though the
    trailing dummy bin is typically 50-90%% empty. Real edges past the budget
    are dropped with the overflow flag raised. None = no budget (buffers
    cover every slot)."""
    e = edge_k.shape[0]
    # Single-key sort carrying the payloads: the argsort-then-gather form
    # spent ~24 ms per e-sized payload gather on chip (3 gathers per map);
    # the TPU sort network moves the payloads for free. (Single int32 key —
    # distinct from the multi-word-key sort pattern the axon backend
    # miscompiled; exactness guarded by tools/tpu_regression_checks.py.)
    orig = jnp.arange(e, dtype=jnp.int32)
    edge_k, edge_in, edge_out, s_orig = jax.lax.sort(
        (edge_k, edge_in, edge_out, orig), num_keys=1)

    # Bin sizes by binary search over the sorted keys (an e-sized scatter-add
    # here measured ~29 ms per map; K+2 searches are microseconds).
    bounds = jnp.searchsorted(
        edge_k, jnp.arange(k_total + 2, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    counts = jnp.diff(bounds)  # [K+1]
    starts_raw = bounds[:-1]
    padded = -(-counts // tile) * tile  # ceil to tile multiple
    starts_pad = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(padded)[:-1]])
    # Padded slot of each edge: pos = arange + (bin padding inserted before
    # it). The shift is piecewise constant, jumping at bin starts — scatter
    # the K+1 jump amounts and prefix-sum, instead of two e-sized table
    # gathers (~40 ms per map on chip).
    pad_before = starts_pad - starts_raw  # [K+1], nondecreasing
    jumps = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), pad_before]))
    jump_e = jnp.zeros(e + 1, jnp.int32).at[
        jnp.minimum(starts_raw, e)].add(jumps, mode="drop")[:e]
    pos = jnp.arange(e, dtype=jnp.int32) + jnp.cumsum(jump_e)

    # Live region = every real bin's padded extent; the dummy (k_total) bin
    # begins at starts_pad[k_total]. With a budget, buffers stop there.
    live_end = starts_pad[k_total]
    if live_cap is None:
        # static upper bound on padded length, rounded to a whole tile count
        e_pad = -(-(e + (k_total + 1) * tile) // tile) * tile
    else:
        e_pad = -(-live_cap // tile) * tile
        # >= (not >): the final slot is forced dummy below, so an exactly-
        # full budget must flag rather than silently lose that one edge.
        overflow = jnp.logical_or(overflow, live_end >= e_pad)

    out_slots = row_inv = tier_bounds = None
    if slot_shape is not None:
        # Tile position of each INCOMING edge: sort (original index, pos)
        # back to input order — a second e-sized sort (~1 ms) instead of an
        # e-sized inverse-permutation scatter (~15 ms on chip). Dummy slots
        # (and budget-dropped edges) become -1: the gather-sum conv redirects
        # them to one appended zero product row, a cache-resident read,
        # instead of scattering reads across the dummy bin.
        _, back = jax.lax.sort((s_orig, pos), num_keys=1)
        back = jnp.where((back < live_end) & (back < e_pad), back, -1)
        out_slots = back.reshape(slot_shape)
        if transpose_slots:
            out_slots = out_slots.T
        out_slots, row_inv, tier_bounds = _degree_sort_slots(out_slots)

    n_tiles = e_pad // tile
    # Tile fill by GATHER, not scatter: slot s belongs to bin b(s) (binary
    # search over the K+1 padded bin ends); its edge is the sorted list's
    # entry at the bin's raw start plus the within-bin offset. The scatter
    # form (full(e_pad).at[pos].set) paid e = M*d_cap updates per array at
    # the chip's scalar scatter rate (~53 ms/pair across the 6D maps at
    # bench shape); this pays one e_pad-sized gather, and e_pad under the
    # live-edge budgets is a small fraction of e. Dummy-bin slots stay -1
    # (the old form wrote invalid edges there; tiles are skipped either way
    # via tile_k = -1, and -1 additionally zeroes the product). The final
    # slot is therefore always a zero product — the tiered slot-sum points
    # absent edges at it instead of appending a zero row (a full-buffer
    # copy). Only an exactly-at-budget map could lose a real edge to that
    # guarantee — flagged above. Gather-composed maps never read tile_out;
    # skip it entirely.
    # Bins are tile-aligned, so a SLOT's bin is its TILE's bin: one
    # searchsorted over n_tiles first-slots (a per-SLOT searchsorted here
    # measured ~200 ms/pair — XLA lowers it elementwise), then broadcast the
    # per-tile bin tables across the tile dimension.
    ends_pad = jnp.cumsum(padded)
    first_slot = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    tkb = jnp.minimum(jnp.searchsorted(ends_pad, first_slot,
                                       side="right").astype(jnp.int32),
                      k_total)
    sp_t = starts_pad[tkb]
    cr_t = counts[tkb]
    sr_t = starts_raw[tkb]
    off = jnp.arange(tile, dtype=jnp.int32)
    o = first_slot[:, None] + off[None, :] - sp_t[:, None]  # [NT, T]
    real = (o < cr_t[:, None]) & (tkb[:, None] < k_total)
    real = real.at[-1, -1].set(False)
    j = jnp.minimum(sr_t[:, None] + o, e - 1)
    tile_in = jnp.where(real, edge_in[j], -1)
    if slot_shape is not None:
        tile_out = jnp.full((n_tiles, tile), -1, jnp.int32)
    else:
        tile_out = jnp.where(real, edge_out[j], -1)
    # A tile's offset: the bin containing its first slot, already tkb; tiles
    # past a bin's real edges (bin padding / the dummy k_total bin) are -1
    # and skipped at compute.
    has_real = first_slot - sp_t < cr_t
    tile_k = jnp.where((tkb < k_total) & has_real, tkb, -1)

    return EdgeMap(tile_in=tile_in, tile_out=tile_out,
                   tile_k=tile_k, overflow=overflow, out_slots=out_slots,
                   row_inv=row_inv, tier_bounds=tier_bounds)


def _tier_widths(d: int) -> tuple:
    """Static degree-tier widths for a slot matrix of width d: geometric
    (4, 16, 64, 256, ...) capped at d. A row of degree g is gathered at the
    narrowest width >= g, bounding gather waste at ~4x mean degree instead of
    the cap d (10-40x above mean at the bench shape's deep 6D levels)."""
    ws = []
    w = 4
    while w < d:
        ws.append(w)
        w *= 4
    ws.append(d)
    return tuple(ws)


def _row_chunk(m: int, w: int = 4) -> int:
    """Rows per tier-loop iteration for tier width w: targets ~8k gathered
    slots per iteration, so a WIDE tier's boundary chunk (one chunk can cost
    ch*w*cout gather elements even when only a handful of rows are that
    heavy) stays as bounded as a narrow tier's. Power of two <= row count so
    every tier's chunk divides the padded row count (rows pad to the widest,
    i.e. largest, chunk)."""
    c = 8
    while c * 2 <= min(m, 2048) and c * 2 * w <= 8192:
        c *= 2
    return c


def _degree_sort_slots(out_slots: jnp.ndarray):
    """Front-pack each row's slots, sort rows by degree (descending), and
    compute the per-tier row bounds. Returns (sorted_slots [M_pad, D],
    row_inv [M], tier_bounds [T+1]); see EdgeMap."""
    m, d = out_slots.shape
    big = jnp.int32(np.iinfo(np.int32).max)
    packed = jnp.sort(jnp.where(out_slots >= 0, out_slots, big), axis=1)
    packed = jnp.where(packed == big, -1, packed)
    deg = jnp.sum(packed >= 0, axis=1).astype(jnp.int32)
    iota = jnp.arange(m, dtype=jnp.int32)
    neg_sorted, perm = jax.lax.sort((-deg, iota), num_keys=1)
    _, row_inv = jax.lax.sort((perm, iota), num_keys=1)
    sorted_slots = packed[perm]
    ws = _tier_widths(d)
    # rows with degree > w form the prefix [0, cnt(w)); cnt by binary search
    # over the ascending -deg
    qs = -jnp.asarray((0,) + ws[:-1], jnp.int32)
    bounds = jnp.searchsorted(neg_sorted, qs, side="left").astype(jnp.int32)
    tier_bounds = jnp.concatenate([bounds, jnp.zeros(1, jnp.int32)])
    ch = _row_chunk(m)
    m_pad = -(-m // ch) * ch
    if m_pad > m:
        sorted_slots = jnp.pad(sorted_slots, ((0, m_pad - m), (0, 0)),
                               constant_values=-1)
    return sorted_slots, row_inv, tier_bounds


@jax.tree_util.register_pytree_node_class
class SizedEdgeMap:
    """EdgeMap plus its STATIC output row count, packaged as a pytree whose
    aux data carries out_rows — so plans holding edge maps survive
    jax.tree.map / vmap batching (out_rows must stay a Python int: it sizes
    the conv output buffer)."""

    def __init__(self, em: EdgeMap, out_rows: int):
        self.em = em
        self.out_rows = out_rows

    def tree_flatten(self):
        return (self.em,), self.out_rows

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


# Tiles per scan chunk: each chunk is one batched gather + einsum + scatter.
# ~32 iterations per map balances the ~45-70us fixed per-iteration cost
# against chunk-rounding waste in the product buffer (larger chunks measured
# NET SLOWER end-to-end: the loop is not iteration-bound, and padding the
# tile count to bigger chunk multiples grows the zero-initialized buffer).
_TILE_CHUNK_MAX = 256


def _chunk_tiles(n_tiles: int) -> int:
    return max(16, min(_TILE_CHUNK_MAX, -(-n_tiles // 32)))


def _chunk_products(feats, kernel, c_in, c_k):
    """Per-edge products of one chunk of tiles: [CT, T, Cout] f32."""
    w = kernel[jnp.maximum(c_k, 0)]  # [CT, Cin, Cout]
    x = jnp.where((c_in >= 0)[..., None],
                  feats[jnp.maximum(c_in, 0)], 0)  # [CT, T, Cin]
    y = jnp.einsum("ktc,kcd->ktd", x, w, preferred_element_type=jnp.float32)
    return jnp.where((c_k >= 0)[:, None, None], y, 0.0)


def _live_chunks(tk):
    """Chunks up to the last real tile. Real edges occupy a prefix of the
    tile array save for small in-bin padding; the trailing dummy bin
    (per-row d_cap padding, 50-75% of the slots at deep 6D levels) is all -1
    tiles. A dynamic-bound loop skips it — a lax.cond per chunk does NOT:
    under the model's vmap the cond becomes a select and both branches
    execute."""
    n_chunks, tile_chunk = tk.shape
    tile_iota = jnp.arange(n_chunks * tile_chunk, dtype=jnp.int32)
    n_live = jnp.max(jnp.where(tk.reshape(-1) >= 0, tile_iota, -1)) + 1
    return -(-n_live // tile_chunk)


def _int_zeros(*arrays):
    """float0 cotangents for integer (non-differentiable) array arguments."""
    import numpy as _np

    return tuple(_np.zeros(a.shape, dtype=jax.dtypes.float0) for a in arrays)


@jax.custom_vjp
def _conv_gather(feats, kernel, tin, tk, out_slots, row_inv, tier_bounds):
    """Gather-sum composition: materialize every edge's product in tile
    order, then each output row GATHERS its slots and sums (the scatter-add
    this replaces ran ~10x slower on chip). Products are stored in the
    compute dtype (the gather traffic is the cost center) and summed in f32.
    Rows are processed in degree tiers (see EdgeMap.out_slots): each tier's
    fori_loop bound is dynamic, so a map whose live degrees sit far below
    the exactness cap D gathers only what exists. The product loop bound is
    dynamic too (skips the dummy region); backward runs through the
    static-bound twin below via custom_vjp."""
    n_chunks, tile_chunk, t = tin.shape
    cout = kernel.shape[2]

    def body(c, ys):
        y = _chunk_products(feats, kernel, tin[c], tk[c]).astype(feats.dtype)
        return jax.lax.dynamic_update_slice(ys, y[None], (c, 0, 0, 0))

    ys0 = jnp.zeros((n_chunks, tile_chunk, t, cout), feats.dtype)
    ys = jax.lax.fori_loop(0, _live_chunks(tk), body, ys0)
    return _slot_sum_tiered(ys, out_slots, row_inv, tier_bounds, cout)


def _slot_sum_tiered(ys, out_slots, row_inv, tier_bounds, cout):
    """Degree-tiered per-row gather-sum of edge products. -1 slots (absent
    edges) read one appended zero row — a cache-resident address. Tier t
    covers degree-sorted rows [tier_bounds[t+1], tier_bounds[t]) and gathers
    only its static width; chunks straddling a tier boundary keep the
    neighbor tier's rows via a mask (both tiers process the chunk, each
    writing only its own rows)."""
    # The product buffer's final slot is guaranteed zero (sparse_conv_edges
    # pads at least one trailing -1 tile slot, never written by the dynamic-
    # bound product loop and zeroed by _chunk_products in the static twin),
    # so absent edges read it instead of paying a full-buffer concatenate to
    # append a zero row (~18 ms/pair at the bench shape).
    flat = ys.reshape(-1, cout)
    zero_row = flat.shape[0] - 1
    m_pad, d = out_slots.shape
    m = row_inv.shape[0]
    acc0 = jnp.zeros((m_pad, cout), jnp.float32)

    def tier(j, w, acc):
        start = tier_bounds[j + 1]
        end = tier_bounds[j]
        ch = _row_chunk(m, w)

        def body(c, a):
            sl = jax.lax.dynamic_slice(out_slots, (c * ch, 0), (ch, w))
            g = jnp.where(sl >= 0, sl, zero_row)
            part = jnp.sum(flat[g], axis=1, dtype=jnp.float32)
            return jax.lax.dynamic_update_slice(a, part, (c * ch, 0))

        return jax.lax.fori_loop(start // ch, -(-end // ch), body, acc)

    # Tiers run NARROW -> WIDE, so boundary-chunk overlap needs no masking:
    # a chunk row outside its tier is either lighter (the narrow width
    # already summed it fully — extra slots are -1) or heavier (a later,
    # wider tier rewrites it at full width). Masking cost a per-chunk
    # read-modify-write of the [ch, cout] accumulator — at deep-level couts
    # that tripled the loop's memory traffic.
    acc = acc0
    for j, w in enumerate(_tier_widths(d)):
        acc = tier(j, w, acc)
    return acc[row_inv]  # [M, Cout] in original row order


def _slot_sum_static(ys, out_slots, row_inv, cout):
    """Static full-width twin of _slot_sum_tiered (differentiable). The
    final slot is zero here too: the static scan writes every chunk, and
    _chunk_products zeroes dummy (-1) tile slots."""
    flat = ys.reshape(-1, cout)
    slots = jnp.where(out_slots >= 0, out_slots, flat.shape[0] - 1)
    return jnp.sum(flat[slots], axis=1, dtype=jnp.float32)[row_inv]


def _conv_gather_static(feats, kernel, tin, tk, out_slots, row_inv):
    """Differentiable twin of _conv_gather (static bounds throughout)."""
    cout = kernel.shape[2]

    def body(_, chunk):
        return None, _chunk_products(feats, kernel, *chunk).astype(feats.dtype)

    _, ys = jax.lax.scan(body, None, (tin, tk))
    return _slot_sum_static(ys, out_slots, row_inv, cout)


def _chunk_bwd_step(carry, feats, kernel, c_in, c_k, dy_rows, dy_src):
    """One chunk of the streaming conv backward, shared by the gather and
    scatter compositions (they differ only in where dy comes from: dy_rows
    indexes dy_src — acc-order rows into dacc, or tile_out rows into g).
    Accumulates (df, dk) for the chunk's edges."""
    df, dk = carry
    n = feats.shape[0]
    cin = kernel.shape[1]
    w = kernel[jnp.maximum(c_k, 0)].astype(jnp.float32)  # [CT, Cin, Cout]
    dy = jnp.where((dy_rows >= 0)[..., None],
                   dy_src[jnp.maximum(dy_rows, 0)], 0.0)  # [CT, T, Cout]
    dy = jnp.where((c_k >= 0)[:, None, None], dy, 0.0)
    dx = jnp.einsum("ktd,kcd->ktc", dy, w,
                    preferred_element_type=jnp.float32)
    df = df.at[jnp.where(c_in >= 0, c_in, n).reshape(-1)].add(
        dx.reshape(-1, cin), mode="drop")
    x = jnp.where((c_in >= 0)[..., None],
                  feats[jnp.maximum(c_in, 0)], 0).astype(jnp.float32)
    dkc = jnp.einsum("ktc,ktd->kcd", x, dy,
                     preferred_element_type=jnp.float32)
    dk = dk.at[jnp.maximum(c_k, 0)].add(
        jnp.where((c_k >= 0)[:, None, None], dkc, 0.0))
    return df, dk


def _conv_gather_fwd(feats, kernel, tin, tk, out_slots, row_inv, tier_bounds):
    return _conv_gather(feats, kernel, tin, tk, out_slots, row_inv,
                        tier_bounds), (
        feats, kernel, tin, tk, out_slots, row_inv, tier_bounds)


def _conv_gather_bwd(res, g):
    """Streaming backward: chunked like the forward, O(chunk) temporaries.

    jax.vjp of the static twin materialized the cotangent of the per-row
    slot gather as one [M_pad, D, Cout] broadcast — 15 GB at the training
    shape (batch-vmapped 6D level maps, edge_budget_scale 2.5), which OOMed
    the 16 GB chip the first time full-scale training ran. The linear
    structure needs none of that: per-edge cotangent dy[e] = dacc[row(e)]
    (one gather), df = scatter-add of dy @ W^T, dW = sum of x^T dy — all
    computed per tile chunk. row(e) is recovered from out_slots by one
    int32 scatter (same footprint as out_slots itself)."""
    feats, kernel, tin, tk, out_slots, row_inv, tier_bounds = res
    n_chunks, tile_chunk, t = tin.shape
    k_total, cin, cout = kernel.shape
    n = feats.shape[0]
    e_flat = n_chunks * tile_chunk * t
    m_pad, d = out_slots.shape

    # acc-order (degree-sorted) cotangent: forward returned acc[row_inv].
    dacc = jnp.zeros((m_pad, cout), jnp.float32).at[row_inv].set(
        g.astype(jnp.float32))
    # Flat slot -> degree-sorted output row; -1 (absent/dummy slots) -> 0 dy.
    r_ids = jnp.broadcast_to(
        jnp.arange(m_pad, dtype=jnp.int32)[:, None], (m_pad, d))
    rows = jnp.full((e_flat,), -1, jnp.int32).at[
        jnp.where(out_slots >= 0, out_slots, e_flat)].set(
        r_ids, mode="drop").reshape(n_chunks, tile_chunk, t)

    def body(c, carry):
        return _chunk_bwd_step(carry, feats, kernel, tin[c], tk[c],
                               rows[c], dacc)

    df0 = jnp.zeros((n, cin), jnp.float32)
    dk0 = jnp.zeros((k_total, cin, cout), jnp.float32)
    df, dk = jax.lax.fori_loop(0, _live_chunks(tk), body, (df0, dk0))
    return (df.astype(feats.dtype), dk.astype(kernel.dtype)) + _int_zeros(
        tin, tk, out_slots, row_inv, tier_bounds)


_conv_gather.defvjp(_conv_gather_fwd, _conv_gather_bwd)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_scatter(m, feats, kernel, tin, tk, tout):
    """Scatter-add composition for transposed maps (no static per-row slot
    pattern). Dynamic loop bound; backward via the static twin."""
    cout = kernel.shape[2]

    def body(c, acc):
        y = _chunk_products(feats, kernel, tin[c], tk[c])
        idx = jnp.where(tout[c] >= 0, tout[c], m)  # padding -> dropped
        return acc.at[idx.reshape(-1)].add(y.reshape(-1, cout), mode="drop")

    acc0 = jnp.zeros((m, cout), jnp.float32)
    return jax.lax.fori_loop(0, _live_chunks(tk), body, acc0)


def _conv_scatter_static(m, feats, kernel, tin, tk, tout):
    cout = kernel.shape[2]

    def body(acc, chunk):
        c_in, c_k, c_out = chunk
        y = _chunk_products(feats, kernel, c_in, c_k)
        idx = jnp.where(c_out >= 0, c_out, m)
        return acc.at[idx.reshape(-1)].add(y.reshape(-1, cout),
                                           mode="drop"), None

    acc0 = jnp.zeros((m, cout), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (tin, tk, tout))
    return out


def _conv_scatter_fwd(m, feats, kernel, tin, tk, tout):
    return _conv_scatter(m, feats, kernel, tin, tk, tout), (
        feats, kernel, tin, tk, tout)


def _conv_scatter_bwd(m, res, g):
    """Streaming backward (see _conv_gather_bwd): dy[e] = g[tout(e)] is one
    gather per chunk; jax.vjp of the static twin stored every chunk's
    gathered activations as scan residuals (O(E * Cin) — GBs at the
    training shape)."""
    feats, kernel, tin, tk, tout = res
    k_total, cin, cout = kernel.shape
    n = feats.shape[0]
    gf = g.astype(jnp.float32)

    def body(c, carry):
        return _chunk_bwd_step(carry, feats, kernel, tin[c], tk[c],
                               tout[c], gf)

    df0 = jnp.zeros((n, cin), jnp.float32)
    dk0 = jnp.zeros((k_total, cin, cout), jnp.float32)
    df, dk = jax.lax.fori_loop(0, _live_chunks(tk), body, (df0, dk0))
    return (df.astype(feats.dtype), dk.astype(kernel.dtype)) + _int_zeros(
        tin, tk, tout)


_conv_scatter.defvjp(_conv_scatter_fwd, _conv_scatter_bwd)


def sparse_conv_edges(feats: jnp.ndarray, kernel: jnp.ndarray, em: EdgeMap,
                      bias: jnp.ndarray | None = None,
                      out_rows: int | None = None) -> jnp.ndarray:
    """Edge-compacted convolution. feats [N, Cin], kernel [K, Cin, Cout].

    out_rows: number of output rows M (defaults to N — correct for stride-1
    self maps; strided/transposed maps must pass their own M).
    """
    k_total, cin, cout = kernel.shape
    m = feats.shape[0] if out_rows is None else out_rows
    n_tiles, t = em.tile_in.shape
    compute_dtype = feats.dtype
    kernel = kernel.astype(compute_dtype)

    tile_chunk = _chunk_tiles(n_tiles)
    n_chunks = -(-n_tiles // tile_chunk)
    pad_t = n_chunks * tile_chunk - n_tiles
    tin = jnp.pad(em.tile_in, ((0, pad_t), (0, 0)), constant_values=-1)
    tk = jnp.pad(em.tile_k, (0, pad_t), constant_values=-1)
    tin = tin.reshape(n_chunks, tile_chunk, t)
    tk = tk.reshape(n_chunks, tile_chunk)

    if em.out_slots is not None:
        out = _conv_gather(feats, kernel, tin, tk, em.out_slots,
                           em.row_inv, em.tier_bounds)
    else:
        tout = jnp.pad(em.tile_out, ((0, pad_t), (0, 0)), constant_values=-1)
        tout = tout.reshape(n_chunks, tile_chunk, t)
        out = _conv_scatter(m, feats, kernel, tin, tk, tout)
    if bias is not None:
        out = out + bias
    return out.astype(compute_dtype)
