"""Dense-grid coordinate lookup — the fast path for bounded 3D extents.

For 3D voxel grids whose extent fits a static box (3DMatch rooms at 5 cm:
~256^3; KITTI scans at 30 cm: ~768x768x128), a dense int32 index array turns a
coordinate lookup into *address arithmetic + one gather* — versus the hash
table's bucket gather + 8-slot window probe over multiple key words
(ops/hashing.py). Kernel-map construction is the framework's hottest
non-GEMM operation, so this cuts its memory traffic by ~10x.

The box SIZE is static (config); its ORIGIN is dynamic (the per-cloud
coordinate minimum), so any scene position works as long as the span fits.
Coordinates outside the span fall back to "absent" (-1) — callers choose
extents with headroom; the builder reports an ``overflow`` flag like the hash
table does. At pyramid level l the coordinates are multiples of 2^l, so the
dense array shrinks 8x per level (total memory ~1.14x the level-0 box).

6D inlier-net grids cannot use a dense box (extent^6); they stay on the hash
path — build_unet_plan auto-selects per dimensionality.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .sparse_grid import Grid


class DenseTable(NamedTuple):
    """Dense index over a [X, Y, Z] box at a given tensor stride.

    dense:    int32 [X*Y*Z] — row index at each in-box cell, -1 if empty.
    cmin:     int32 [3] — dynamic coordinate origin of the box.
    overflow: bool — some valid coordinate fell outside the box (lookups for
              those rows return -1; size your extent with headroom).
    num:      int32 scalar.
    """

    dense: jnp.ndarray
    cmin: jnp.ndarray
    overflow: jnp.ndarray
    num: jnp.ndarray


def padded_extent(extent: Tuple[int, int, int], pad: int
                  ) -> Tuple[int, int, int]:
    """The extent a table built with ``pad`` answers lookups against."""
    return tuple(int(e) + 2 * pad for e in extent)


def build_dense_table(grid: Grid, extent: Tuple[int, int, int],
                      log2_stride: int = 0, reduce: str = "set",
                      pad: int = 0) -> DenseTable:
    """Scatter row indices of a (unique-coordinate) grid into the dense box.

    extent: static box size in cells *at this level's stride granularity*.
    log2_stride: coordinates are multiples of 2**log2_stride (pyramid level).
    reduce: 'set' requires unique coordinates (one row per cell); 'min'
    accepts duplicates and keeps each cell's SMALLEST row index — the
    deterministic group representative the 6D multimap builder needs
    (ops/paired_kernel_map.build_multimap), replacing its hash-based
    unique_rows pass (~21 ms/pair of claim-round scatters on chip).
    pad: empty border cells added on EVERY side of the box (the origin
    shifts by -pad so data starts at cell ``pad``). All subsequent lookups
    must pass ``padded_extent(extent, pad)``. A pad >= ks//2 guarantees a
    row's whole ks-cube neighborhood lies inside the box, which lets the
    patch probes (_gather_patch consumers) fetch it with ONE gather index
    per row — the per-INDEX cost of XLA's TPU gather is what bounds plan
    builds (tools/patch_gather_law.py), so collapsing 9-98 indices per row
    into one is the plan-build fast path.
    """
    ex, ey, ez = (int(e) + 2 * pad for e in extent)
    n = grid.capacity
    valid = grid.valid_mask()
    big = jnp.int32(1 << 29)
    coords = jnp.where(valid[:, None], grid.coords, big)
    # dynamic origin (valid rows only), shifted so data starts at cell `pad`
    cmin = jnp.min(coords, axis=0) - jnp.int32(pad << log2_stride)
    rel0 = (grid.coords[:, 0] - cmin[0]) >> log2_stride
    rel1 = (grid.coords[:, 1] - cmin[1]) >> log2_stride
    rel2 = (grid.coords[:, 2] - cmin[2]) >> log2_stride
    inb = ((rel0 >= 0) & (rel0 < ex) & (rel1 >= 0) & (rel1 < ey)
           & (rel2 >= 0) & (rel2 < ez) & valid)
    addr = (rel0 * ey + rel1) * ez + rel2
    size = ex * ey * ez
    if reduce == "min":
        dense = jnp.full((size,), n, jnp.int32)
        dense = dense.at[jnp.where(inb, addr, size)].min(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        dense = jnp.where(dense == n, -1, dense)
    else:
        dense = jnp.full((size,), -1, jnp.int32)
        dense = dense.at[jnp.where(inb, addr, size)].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
    overflow = jnp.any(valid & jnp.logical_not(inb))
    return DenseTable(dense=dense, cmin=cmin, overflow=overflow, num=grid.num)


def dense_lookup_cols(table: DenseTable, extent: Tuple[int, int, int],
                      log2_stride: int, qcols: Sequence[jnp.ndarray],
                      query_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Lookup per-dimension query coordinate arrays (any common shape)."""
    ex, ey, ez = (int(e) for e in extent)
    d0 = qcols[0] - table.cmin[0]
    d1 = qcols[1] - table.cmin[1]
    d2 = qcols[2] - table.cmin[2]
    rel0, rel1, rel2 = d0 >> log2_stride, d1 >> log2_stride, d2 >> log2_stride
    inb = ((rel0 >= 0) & (rel0 < ex) & (rel1 >= 0) & (rel1 < ey)
           & (rel2 >= 0) & (rel2 < ez))
    if log2_stride > 0:
        # Table coordinates are multiples of 2**log2_stride; a misaligned query
        # (e.g. a transpose-conv site between coarse cells) must miss, not
        # alias onto the floor cell.
        mask = jnp.int32((1 << log2_stride) - 1)
        inb = inb & ((d0 & mask) == 0) & ((d1 & mask) == 0) & ((d2 & mask) == 0)
    if query_valid is not None:
        inb = inb & query_valid
    addr = jnp.where(inb, (rel0 * ey + rel1) * ez + rel2, 0)
    hit = table.dense[addr]
    return jnp.where(inb, hit, -1).astype(jnp.int32)


# Use ONE lax.gather patch per output row (slice_sizes=(ks,ks,ks)) instead of
# per-offset element gathers wherever the table was built with pad >= ks//2.
# MEASURED ON CHIP (tools/patch_gather_law.py, v5e): small multi-dim slice
# gathers are ~70x WORSE per index than scalar gathers (patch333 1 M idx/s vs
# scalar 71 M idx/s) — XLA lowers strided sub-lane slices with a serial
# inner loop. Only CONTIGUOUS full-lane rows are fast (row128: 30 M idx/s at
# 3.9 G elem/s). Default OFF; kept for the equivalence tests and as a record
# of the measured negative result.
PATCH_GATHER = False


def _gather_patch(table: DenseTable, extent: Tuple[int, int, int],
                  log2_stride: int, coords: jnp.ndarray, valid: jnp.ndarray,
                  ks: int, pad: int):
    """[M, ks, ks, ks] neighborhood patches centered on each row's cell.

    Requires pad >= ks//2 + (how far below the table's data region a center
    can sit): every such row's patch then lies inside the padded box with no
    boundary shuffling. Centers from the table's OWN grid are always in the
    data region (margin 0); centers from a floor-strided coarser grid can
    sit ONE cell below it (margin 1). Rows that are invalid or whose patch
    would still clamp (out-of-box under extent overflow) return all -1 —
    the per-offset paths' miss semantics for every cell of their patch.
    """
    ex, ey, ez = (int(e) for e in extent)
    r = ks // 2
    assert pad >= r, "patch probes need a table built with pad >= ks//2"
    ok = valid
    starts = []
    for i, e in enumerate((ex, ey, ez)):
        rel = (coords[:, i] - table.cmin[i]) >> log2_stride
        s = rel - r
        sc = jnp.clip(s, 0, e - ks)
        ok = ok & (s == sc)  # false only for invalid / out-of-box rows
        starts.append(sc)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    patch = jax.lax.gather(
        table.dense.reshape(ex, ey, ez), jnp.stack(starts, axis=1), dn,
        (ks, ks, ks), mode="clip")
    return jnp.where(ok[:, None, None, None], patch, -1)


def patch_kernel_map_dense(table: DenseTable, extent: Tuple[int, int, int],
                           log2_stride: int, out_grid: Grid, ks: int,
                           pad: int) -> jnp.ndarray:
    """Full-cube kernel map [ks^3, M] via one patch gather per output row.

    Odometer offset order (dimension 0 fastest — kernel_map.HYPER_CUBE), the
    [K, M] kernel-map convention; equals _cube_kernel_map_dense exactly."""
    patch = _gather_patch(table, extent, log2_stride, out_grid.coords,
                          out_grid.valid_mask(), ks, pad)  # [M, dx, dy, dz]
    return jnp.transpose(patch, (3, 2, 1, 0)).reshape(ks ** 3, -1)


def patch_member_rows(members: jnp.ndarray, table: DenseTable,
                      extent: Tuple[int, int, int], log2_stride: int,
                      coords: jnp.ndarray, valid: jnp.ndarray, ks: int,
                      pad: int, pad_word) -> jnp.ndarray:
    """[ks^3, M, W] member rows of every cube-offset cell around each row's
    cell, LEXICOGRAPHIC offset order (dim 0 slowest).

    members: [X*Y*Z, W] spatially-keyed rows (one per dense cell — see
    ops/paired_kernel_map.build_multimap dense_members). One gather index
    per output row fetches the whole (ks, ks, ks, W) neighborhood; rows
    that are invalid or whose patch would clamp return pad_word rows."""
    ex, ey, ez = (int(e) for e in extent)
    w = members.shape[-1]
    r = ks // 2
    assert pad >= r, "patch probes need a table built with pad >= ks//2"
    ok = valid
    starts = []
    for i, e in enumerate((ex, ey, ez)):
        rel = (coords[:, i] - table.cmin[i]) >> log2_stride
        s = rel - r
        sc = jnp.clip(s, 0, e - ks)
        ok = ok & (s == sc)
        starts.append(sc)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    patch = jax.lax.gather(
        members.reshape(ex, ey, ez, w), jnp.stack(starts, axis=1), dn,
        (ks, ks, ks, w), mode="clip")  # [M, dx, dy, dz, W]
    patch = jnp.where(ok[:, None, None, None, None], patch, pad_word)
    m = coords.shape[0]
    return jnp.transpose(patch, (1, 2, 3, 0, 4)).reshape(ks ** 3, m, w)


def patch_lookup_cube(table: DenseTable, extent: Tuple[int, int, int],
                      log2_stride: int, coords: jnp.ndarray,
                      valid: jnp.ndarray, ks: int, pad: int) -> jnp.ndarray:
    """[ks^3, M] cube-neighborhood lookups in LEXICOGRAPHIC offset order
    (dimension 0 slowest, dimension 2 fastest) — the order np.unique gives
    the 6D builders' distinct first-half offsets
    (ops/paired_kernel_map._split_offset_tables)."""
    patch = _gather_patch(table, extent, log2_stride, coords, valid, ks, pad)
    return patch.reshape(-1, ks ** 3).T


def build_occupancy_words(table: DenseTable, extent: Tuple[int, int, int]
                          ) -> jnp.ndarray:
    """Bit-pack the dense table's occupancy along the minor (z) axis.

    Returns uint32 [ceil(X*Y*Z / 32)]: bit (addr & 31) of word (addr >> 5) is
    set iff cell ``addr`` holds a row. 256^3 cells pack into 2 MB — small
    enough that the conv1 occupancy probe (see conv1_ones_occupancy) reads it
    at near-cache rates instead of gathering the 64 MB int32 table.

    (A column-aligned 2D [X*Y, ceil(Z/32)+1] layout enabling whole-patch 2D
    slices was tried in r5 and measured 9x SLOWER end-to-end: the 9-word
    minor dimension is hostile to the TPU's 128-lane tiling.)"""
    ex, ey, ez = (int(e) for e in extent)
    size = ex * ey * ez
    nwords = -(-size // 32)
    occ = (table.dense >= 0).astype(jnp.uint32)
    occ = jnp.pad(occ, (0, nwords * 32 - size)).reshape(nwords, 32)
    return jnp.sum(occ << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1,
                   dtype=jnp.uint32)


def conv1_ones_occupancy(table: DenseTable, extent: Tuple[int, int, int],
                         out_grid: Grid, kernel_size: int,
                         pad: int = 0) -> jnp.ndarray:
    """Occupancy matrix O [M, K] for a first-layer conv with ALL-ONES input.

    With x == 1 everywhere, ``out[j] = sum_k x[i_k(j)] W_k = O[j] @ W``: the
    kernel map degenerates to its occupancy pattern and conv1 becomes ONE MXU
    matmul (models/common.apply_conv1_ones). This replaces both the K=343
    dense-table gather (11M scalar loads) and the 343-offset gather-GEMM scan
    — the two dominant costs of the FCGF forward measured on chip (reference
    hot loop: MinkowskiConvolution at model/resunet.py:598-649, fed ones at
    core/deep_global_registration.py:159).

    The probe gathers, per output row and (dx, dy) offset pair, TWO adjacent
    uint32 words of the bit-packed z-axis occupancy — 2*ks^2 element gathers
    per row instead of ks^3 — and extracts the ks z-bits by shifts. Columns
    are returned in odometer order (dim 0 fastest) to match the [K, Cin,
    Cout] kernel layout. Stride-1 / level-0 only.
    """
    ex, ey, ez = (int(e) for e in extent)
    ks = int(kernel_size)
    r = ks // 2
    assert ks % 2 == 1 and ez >= ks, "odd kernels within the box only"
    if PATCH_GATHER and pad >= r:
        # One patch gather per row (vs 2*ks^2 word-pair gathers): the gather
        # wall is per-index, so the int32 patch beats the bit-packed reads.
        patch = _gather_patch(table, extent, 0, out_grid.coords,
                              out_grid.valid_mask(), ks, pad)
        return (jnp.transpose(patch, (0, 3, 2, 1)) >= 0).reshape(-1, ks ** 3)
    words = build_occupancy_words(table, extent)

    valid = out_grid.valid_mask()  # [M]
    rel0 = out_grid.coords[:, 0] - table.cmin[0]
    rel1 = out_grid.coords[:, 1] - table.cmin[1]
    rel2 = out_grid.coords[:, 2] - table.cmin[2]

    d = jnp.arange(ks, dtype=jnp.int32) - r
    x = rel0[:, None, None] + d[None, :, None]  # [M, dx, 1]
    y = rel1[:, None, None] + d[None, None, :]  # [M, 1, dy]
    valid_xy = ((x >= 0) & (x < ex) & (y >= 0) & (y < ey)
                & valid[:, None, None])  # [M, ks, ks]

    zbase = rel2 - r
    zclamp = jnp.clip(zbase, 0, ez - ks)  # [M] aligned, always in-row
    addr = (x * ey + y) * ez + zclamp[:, None, None]
    addr = jnp.where(valid_xy, addr, 0)
    w_idx = addr >> 5
    b = (addr & 31).astype(jnp.uint32)
    # ONE sliced gather for the adjacent word pair (two element gathers here
    # measured 2x the cost on chip); one pad word keeps the slice in bounds.
    words_p = jnp.concatenate([words, jnp.zeros((1,), jnp.uint32)])
    wpair = jax.vmap(lambda a: jax.lax.dynamic_slice(words_p, (a,), (2,)))(
        w_idx.reshape(-1)).reshape(w_idx.shape + (2,))
    w0, w1 = wpair[..., 0], wpair[..., 1]
    # 32-bit window starting at bit offset b of the 64-bit concat (b<32, and
    # the needed bit index stays < 32: dz + (zbase - zclamp) <= 2(ks-1) - r).
    win = (w0 >> b) | jnp.where(b == 0, jnp.uint32(0),
                                w1 << (jnp.uint32(32) - b))

    dz = jnp.arange(ks, dtype=jnp.int32)
    shift = dz[None, :] + (zbase - zclamp)[:, None]  # [M, dz]
    valid_z = (zbase[:, None] + dz[None, :] >= 0) & \
              (zbase[:, None] + dz[None, :] < ez)
    shift = jnp.clip(shift, 0, 31).astype(jnp.uint32)
    bits = (win[:, :, :, None] >> shift[:, None, None, :]) & jnp.uint32(1)
    occ = (bits != 0) & valid_xy[..., None] & valid_z[:, None, None, :]
    # [M, dx, dy, dz] -> odometer order k = dx + ks*dy + ks^2*dz
    return jnp.transpose(occ, (0, 3, 2, 1)).reshape(-1, ks ** 3)


def _is_odometer_cube(offsets) -> int:
    """ks if offsets enumerate the full [-r, r]^3 cube in odometer order
    (dimension 0 fastest — ops/kernel_map.kernel_offsets HYPER_CUBE), else 0."""
    import numpy as np

    from . import kernel_map

    k = offsets.shape[0]
    ks = round(k ** (1 / 3))
    if ks ** 3 != k or ks % 2 != 1:
        return 0
    cube = kernel_map.kernel_offsets(ks, 3, kernel_map.HYPER_CUBE)
    return ks if np.array_equal(np.asarray(offsets), cube) else 0


def _cube_kernel_map_dense(table: DenseTable, extent: Tuple[int, int, int],
                           log2_stride: int, out_grid: Grid,
                           ks: int) -> jnp.ndarray:
    """Full-cube kernel map via z-run sliced gathers.

    The z (minor) axis of the dense box is contiguous in memory, so the ks
    offsets that differ only in dz are ONE sliced gather instead of ks
    element gathers — 27-offset maps issue 9 slice-loads per row (measured
    ~2x faster than 27 element gathers on chip). Requires aligned queries
    (unit == table stride granularity), which holds for conv1/self/down
    maps; transposed (up) maps query between coarse cells and take the
    generic path."""
    ex, ey, ez = (int(e) for e in extent)
    r = ks // 2
    if ez < ks:
        raise ValueError("dense extent z too small for the kernel")
    valid = out_grid.valid_mask()
    rel0 = (out_grid.coords[:, 0] - table.cmin[0]) >> log2_stride
    rel1 = (out_grid.coords[:, 1] - table.cmin[1]) >> log2_stride
    rel2 = (out_grid.coords[:, 2] - table.cmin[2]) >> log2_stride

    d = jnp.arange(ks, dtype=jnp.int32) - r
    x = rel0[:, None, None] + d[None, :, None]  # [M, dx, 1]
    y = rel1[:, None, None] + d[None, None, :]  # [M, 1, dy]
    valid_xy = ((x >= 0) & (x < ex) & (y >= 0) & (y < ey)
                & valid[:, None, None])  # [M, dx, dy]

    zbase = rel2 - r
    zclamp = jnp.clip(zbase, 0, ez - ks)
    addr = (x * ey + y) * ez + zclamp[:, None, None]
    addr = jnp.where(valid_xy, addr, 0)
    dense_p = jnp.concatenate([table.dense,
                               jnp.full((ks,), -1, jnp.int32)])
    runs = jax.vmap(lambda a: jax.lax.dynamic_slice(dense_p, (a,), (ks,)))(
        addr.reshape(-1)).reshape(addr.shape + (ks,))  # [M, dx, dy, run]
    # Slice index of dz's target: dz + (zbase - zclamp); whenever the target
    # z is in [0, ez) the index lands in [0, ks) automatically.
    dz = jnp.arange(ks, dtype=jnp.int32)
    idx = jnp.clip(dz[None, :] + (zbase - zclamp)[:, None], 0, ks - 1)
    vals = jnp.take_along_axis(
        runs, idx[:, None, None, :].astype(jnp.int32),
        axis=3)  # [M, dx, dy, dz]
    zq = zbase[:, None] + dz[None, :]
    zv = (zq >= 0) & (zq < ez)
    hit = jnp.where(valid_xy[..., None] & zv[:, None, None, :], vals, -1)
    # [M, dx, dy, dz] -> odometer k = dx + ks*dy + ks^2*dz, transposed to the
    # [K, M] kernel-map convention.
    return jnp.transpose(hit, (3, 2, 1, 0)).reshape(ks ** 3, -1)


def build_kernel_map_dense(table: DenseTable, extent: Tuple[int, int, int],
                           log2_stride: int, out_grid: Grid, offsets,
                           unit: int, transpose: bool = False,
                           pad: int = 0) -> jnp.ndarray:
    """Kernel map [K, M] through the dense index (3D only).

    extent: the table's PADDED extent when it was built with pad > 0
    (padded_extent); pad enables the one-gather-per-row patch fast path for
    full-cube offset sets with ks//2 <= pad."""
    import numpy as np

    k, d = offsets.shape
    assert d == 3, "dense grid lookup is 3D-only"
    ks = _is_odometer_cube(offsets)
    if ks and not transpose and unit == (1 << log2_stride):
        # pad >= ks//2 + 1 (not just ks//2): a strided OUT grid's centers can
        # sit one cell below the table's data region (floor-striding), i.e.
        # inside the border — the patch must still fit around them.
        if PATCH_GATHER and pad >= ks // 2 + 1:
            return patch_kernel_map_dense(table, extent, log2_stride,
                                          out_grid, ks, pad)
        return _cube_kernel_map_dense(table, extent, log2_stride, out_grid, ks)
    sign = -1 if transpose else 1
    offs = np.asarray(offsets) * unit * sign
    out_valid = out_grid.valid_mask()
    out_cols = tuple(out_grid.coords[:, i] for i in range(3))
    m = out_grid.capacity
    # One shot: [K, M] per-dim queries; the dense gather is 1 load per query so
    # no offset chunking is needed even for K=343.
    off_d = jnp.asarray(offs, dtype=jnp.int32)
    qcols = tuple(out_cols[i][None, :] + off_d[:, i][:, None] for i in range(3))
    qv = jnp.broadcast_to(out_valid[None, :], (k, m))
    return dense_lookup_cols(table, extent, log2_stride, qcols, query_valid=qv)
