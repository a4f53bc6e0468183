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
    out_slots: int32 [M, D] or None — for maps whose edge list has a static
              per-output-row slot pattern (everything except transposed
              maps), the flat tile positions of output row m's edges. The
              convolution then composes its output by GATHERING the per-edge
              products (y[out_slots].sum(1)) instead of scatter-adding them —
              the scatter measured ~10x the cost of the whole rest of the
              conv on chip. Positions of absent edges land in padding/dummy
              tiles whose products are zeroed, so no masking is needed.
    """

    tile_in: jnp.ndarray
    tile_out: jnp.ndarray
    tile_k: jnp.ndarray
    overflow: jnp.ndarray
    out_slots: jnp.ndarray | None = None

    @property
    def tile(self) -> int:
        return self.tile_in.shape[1]


def build_edge_map(kmap: jnp.ndarray, d_cap: int, tile: int = 128) -> EdgeMap:
    """Convert a dense kernel map idx[K, M] into a tile-blocked edge list.

    d_cap: static per-row edge capacity (27 is exact for paired 6D level-0
    maps; deeper levels use a configured cap with the overflow flag).
    """
    edge_k, edge_in, edge_out, k_total, tile_sz, overflow = _compact_edges(
        kmap, d_cap, tile)
    m = kmap.shape[1]
    return _edges_to_tiles(edge_k, edge_in, edge_out, k_total, tile_sz,
                           overflow, slot_shape=(m, edge_k.shape[0] // m))


def build_edge_maps_down_up(kmap_down: jnp.ndarray, d_cap: int,
                            tile: int = 128) -> tuple:
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
                           overflow, slot_shape=(m, edge_k.shape[0] // m))
    up = _edges_to_tiles(edge_k, edge_out, edge_in, k_total, tile_sz,
                         overflow)
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
    are unique per row), so f32 accumulation never rounds."""
    m, s = kt_vals.shape
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    overflow = jnp.any(jnp.sum(valid, axis=1) > d_cap)
    tgt = jnp.where(valid & (rank < d_cap), rank, d_cap)  # d_cap = spill slot
    onehot = jax.nn.one_hot(tgt, d_cap + 1, dtype=jnp.float32)  # [M, S, D+1]
    # Values ride the matmul as BASE-256 DIGITS: TPU einsums multiply in
    # bf16 by default, which rounds integers above 256 — carrying raw row
    # indices corrupted edges by +-1 on hardware (caught by
    # tools/tpu_regression_checks.py; exact on CPU f32). Each digit is
    # <= 255 (bf16-exact), the one-hot is 0/1, and every output column
    # receives at most one nonzero contribution, so f32 accumulation is
    # exact.
    kv = jnp.where(valid, kt_vals + 1, 0)
    iv = jnp.where(valid, it_vals + 1, 0)
    vals = jnp.stack([
        (kv & 0xFF).astype(jnp.float32),
        ((kv >> 8) & 0xFF).astype(jnp.float32),
        (iv & 0xFF).astype(jnp.float32),
        ((iv >> 8) & 0xFF).astype(jnp.float32),
        ((iv >> 16) & 0xFF).astype(jnp.float32),
    ], axis=1)  # [M, 5, S]
    packed = jnp.einsum("mcs,msd->mcd", vals, onehot)[..., :d_cap]
    dig = packed.astype(jnp.int32)
    pk = dig[:, 0] + (dig[:, 1] << 8)
    pi = dig[:, 2] + (dig[:, 3] << 8) + (dig[:, 4] << 16)
    edge_k = jnp.where(pk > 0, pk - 1, k_total).astype(jnp.int32)
    edge_in = (pi - 1).astype(jnp.int32)  # empty -> -1
    edge_k = jnp.where(edge_in >= 0, edge_k, k_total)
    edge_out = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None],
                                (m, d_cap))
    return (edge_k.reshape(-1), edge_in.reshape(-1), edge_out.reshape(-1),
            overflow)


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
                              d_cap: int | None = None) -> EdgeMap:
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
                               overflow, slot_shape=(m, d_cap))
    valid = (slot_k >= 0) & (slot_in >= 0)
    edge_k = jnp.where(valid, slot_k, k_total)
    edge_out = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (s, m))
    return _edges_to_tiles(edge_k.reshape(-1), slot_in.reshape(-1),
                           edge_out.reshape(-1), k_total, tile,
                           jnp.asarray(False), slot_shape=(s, m),
                           transpose_slots=True)


def build_edge_maps_down_up_from_slots(slot_k: jnp.ndarray,
                                       slot_in: jnp.ndarray, k_total: int,
                                       tile: int = 128,
                                       d_cap: int | None = None) -> tuple:
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
                           slot_shape=shape, transpose_slots=tr)
    up = _edges_to_tiles(edge_k, edge_out, edge_in, k_total, tile, overflow)
    return down, up


def _edges_to_tiles(edge_k: jnp.ndarray, edge_in: jnp.ndarray,
                    edge_out: jnp.ndarray, k_total: int, tile: int,
                    overflow: jnp.ndarray, slot_shape=None,
                    transpose_slots: bool = False) -> EdgeMap:
    """Sort edges by offset, pad each offset's bin to a tile multiple, and
    scatter into single-offset tiles. Invalid edges carry k = k_total (a dummy
    trailing bin whose tiles stay marked -1 and are skipped at compute).

    slot_shape: when the INCOMING flat edge order has a static per-output-row
    pattern (row-major [M, D], or [S, M] with transpose_slots=True), also
    compute EdgeMap.out_slots — the tile position of every incoming edge,
    recovered by a second cheap sort — enabling the gather-sum convolution."""
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

    out_slots = None
    if slot_shape is not None:
        # Tile position of each INCOMING edge: sort (original index, pos)
        # back to input order — a second e-sized sort (~1 ms) instead of an
        # e-sized inverse-permutation scatter (~15 ms on chip).
        _, back = jax.lax.sort((s_orig, pos), num_keys=1)
        out_slots = back.reshape(slot_shape)
        if transpose_slots:
            out_slots = out_slots.T

    # static upper bound on padded length, rounded to a whole tile count
    e_pad = -(-(e + (k_total + 1) * tile) // tile) * tile
    n_tiles = e_pad // tile
    tile_in = jnp.full(e_pad, -1, jnp.int32).at[pos].set(edge_in)
    tile_out = jnp.full(e_pad, -1, jnp.int32).at[pos].set(edge_out)
    # A tile's offset: every tile lies inside one bin (bins are tile-aligned),
    # so its k is the bin that contains its first slot — a searchsorted over
    # the K+1 static bin boundaries (an e-sized scatter-max here measured
    # ~9 ms per map on chip; this is ~microseconds). Tiles past a bin's real
    # edges (bin padding / the dummy k_total bin) stay -1 and are skipped.
    ends_pad = jnp.cumsum(padded)  # [K+1] padded bin ends
    first_slot = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    tk = jnp.searchsorted(ends_pad, first_slot, side="right").astype(jnp.int32)
    tk = jnp.minimum(tk, k_total)
    has_real = first_slot - starts_pad[tk] < counts[tk]
    tile_k = jnp.where((tk < k_total) & has_real, tk, -1)

    return EdgeMap(tile_in=tile_in.reshape(n_tiles, tile),
                   tile_out=tile_out.reshape(n_tiles, tile),
                   tile_k=tile_k, overflow=overflow, out_slots=out_slots)


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
def _conv_gather(feats, kernel, tin, tk, out_slots):
    """Gather-sum composition: materialize every edge's product in tile
    order, then each output row GATHERS its (static) slots and sums. The
    scatter-add this replaces ran ~10x slower than the rest of the conv on
    chip; absent edges point at zeroed padding products, so no masking is
    needed. Products are stored in the compute dtype (the gather traffic is
    the cost center) and summed in f32. The fori_loop bound is dynamic
    (skips the dummy region), so the backward pass runs through the
    static-bound twin below via custom_vjp."""
    n_chunks, tile_chunk, t = tin.shape
    cout = kernel.shape[2]

    def body(c, ys):
        y = _chunk_products(feats, kernel, tin[c], tk[c]).astype(feats.dtype)
        return jax.lax.dynamic_update_slice(ys, y[None], (c, 0, 0, 0))

    ys0 = jnp.zeros((n_chunks, tile_chunk, t, cout), feats.dtype)
    ys = jax.lax.fori_loop(0, _live_chunks(tk), body, ys0)
    return jnp.sum(ys.reshape(-1, cout)[out_slots], axis=1,
                   dtype=jnp.float32)  # [M, Cout]


def _conv_gather_static(feats, kernel, tin, tk, out_slots):
    """Differentiable twin of _conv_gather (static scan bound)."""
    cout = kernel.shape[2]

    def body(_, chunk):
        return None, _chunk_products(feats, kernel, *chunk).astype(feats.dtype)

    _, ys = jax.lax.scan(body, None, (tin, tk))
    return jnp.sum(ys.reshape(-1, cout)[out_slots], axis=1, dtype=jnp.float32)


def _conv_gather_fwd(feats, kernel, tin, tk, out_slots):
    return _conv_gather(feats, kernel, tin, tk, out_slots), (
        feats, kernel, tin, tk, out_slots)


def _conv_gather_bwd(res, g):
    feats, kernel, tin, tk, out_slots = res
    _, vjp = jax.vjp(
        lambda f, k: _conv_gather_static(f, k, tin, tk, out_slots),
        feats, kernel)
    df, dk = vjp(g)
    return (df, dk) + _int_zeros(tin, tk, out_slots)


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
    feats, kernel, tin, tk, tout = res
    _, vjp = jax.vjp(
        lambda f, k: _conv_scatter_static(m, f, k, tin, tk, tout),
        feats, kernel)
    df, dk = vjp(g)
    return (df, dk) + _int_zeros(tin, tk, tout)


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
        out = _conv_gather(feats, kernel, tin, tk, em.out_slots)
    else:
        tout = jnp.pad(em.tile_out, ((0, pad_t), (0, 0)), constant_values=-1)
        tout = tout.reshape(n_chunks, tile_chunk, t)
        out = _conv_scatter(m, feats, kernel, tin, tk, tout)
    if bias is not None:
        out = out + bias
    return out.astype(compute_dtype)
