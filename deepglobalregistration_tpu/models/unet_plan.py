"""Shared coordinate-pyramid planning for all U-Net-shaped models.

Every DGR model family (ResUNet/ResUNet2, SimpleNet1-3, PyramidNet) consumes
the same per-cloud precomputation: a stride-2 coordinate pyramid plus kernel
maps for stride-1 self convs, stride-2 down convs, and their transposes. This
is the TPU-native analogue of MinkowskiEngine's coordinate-manager caching,
built fresh per cloud (jittable; vmap for batch).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..ops import hashing, kernel_map, sparse_grid
from ..ops.sparse_grid import Grid


class UNetPlan(NamedTuple):
    """Pyramid of L levels (tensor strides 1, 2, ..., 2^(L-1)) + kernel maps."""

    grids: Tuple[Grid, ...]  # L grids
    conv1_kmap: jnp.ndarray  # [K1, N] at level 0 (first-conv kernel size)
    self_kmaps: Tuple[jnp.ndarray, ...]  # k3 stride-1 maps, one per level
    down_kmaps: Tuple[jnp.ndarray, ...]  # level i -> i+1 (L-1 maps)
    up_kmaps: Tuple[jnp.ndarray, ...]  # level i+1 -> i transposed (L-1 maps)
    pool_down: Tuple[jnp.ndarray, ...] = ()  # k2/s2 sum-pool maps (SP variants)
    pool_up: Tuple[jnp.ndarray, ...] = ()  # k2/s2 pooling-transpose maps
    # OR of every lookup table's overflow flag: True means some kernel-map
    # entries were silently dropped (hash bucket exceeded the probe window, or
    # --dense_extent box too small for the cloud). Surfaced by the pipeline at
    # its existing host syncs; see DeepGlobalRegistration.register().
    overflow: jnp.ndarray = False
    # Occupancy matrix bool [K1, N]-transposed ([N, K1]) replacing conv1_kmap
    # when the first conv's input is known to be all ones: conv1 then runs as
    # one MXU matmul (ops/dense_grid.conv1_ones_occupancy). None = generic.
    conv1_ones: jnp.ndarray | None = None


def build_unet_plan(grid0: Grid, conv1_kernel_size: int, region_type: int,
                    ndim: int, n_levels: int, level_shrink: int = 2,
                    with_pooling: bool = False,
                    dense_extent: Tuple[int, int, int] | None = None,
                    ones_input: bool = False) -> UNetPlan:
    """Build the pyramid + all kernel maps for one input cloud (jittable).

    level_shrink: static per-level capacity divisor (surface scans merge ~4-8x
    voxels per stride-2 level; 1 = worst-case no shrink).
    with_pooling: also build k2/s2 sum-pool + pooling-transpose maps (the
    ResUNetSP family downsamples by pooling instead of strided convs).
    dense_extent: static [X, Y, Z] cell box enabling the dense-index lookup
    fast path (3D only; see ops/dense_grid.py). None = hash tables.
    """
    offs3 = kernel_map.kernel_offsets(3, ndim, region_type)
    offs1 = kernel_map.kernel_offsets(conv1_kernel_size, ndim, region_type)

    grids = [grid0]
    for level in range(1, n_levels):
        cap = max(grid0.capacity // (level_shrink ** level), 128)
        grids.append(sparse_grid.stride_down(grids[-1], 2 ** level, out_capacity=cap))

    use_dense = dense_extent is not None and ndim == 3
    if use_dense:
        from ..ops import dense_grid

        def ext(level):
            return tuple(max(-(-int(e) // (1 << level)), 1) for e in dense_extent)

        # Pad each level's box so every kernel's cube neighborhood stays in
        # bounds: the patch probes (ops/dense_grid.PATCH_GATHER) then fetch a
        # row's whole neighborhood with ONE gather index instead of ks^2-ish.
        # +1 beyond the kernel radius: down-map centers (floor-strided
        # coarser grids) can sit one cell below the data region.
        def pad(level):
            return (conv1_kernel_size // 2 + 1) if level == 0 else 2

        def pext(level):
            return dense_grid.padded_extent(ext(level), pad(level))

        tables = [dense_grid.build_dense_table(g, ext(i), log2_stride=i,
                                               pad=pad(i))
                  for i, g in enumerate(grids)]

        def kmap(i, out_grid, offs, unit, transpose=False):
            return dense_grid.build_kernel_map_dense(
                tables[i], pext(i), i, out_grid, offs, unit,
                transpose=transpose, pad=pad(i))
    else:
        tables = [hashing.build_table(g.coords, g.num) for g in grids]

        def kmap(i, out_grid, offs, unit, transpose=False):
            return kernel_map.build_kernel_map(tables[i], out_grid, offs, unit,
                                               transpose=transpose)

    # With an all-ones input, conv1 degenerates to occupancy @ kernel (one
    # matmul): the dense box probes just 2*ks^2 packed words per row; other
    # paths reuse the kernel map's validity pattern and drop the map itself.
    conv1_ones = None
    if ones_input and ndim == 3:
        if use_dense and region_type == kernel_map.HYPER_CUBE \
                and conv1_kernel_size % 2 == 1:
            conv1_ones = dense_grid.conv1_ones_occupancy(
                tables[0], pext(0), grids[0], conv1_kernel_size, pad=pad(0))
        else:
            conv1_ones = (kmap(0, grids[0], offs1, unit=1) >= 0).T
        conv1_kmap = None
    else:
        conv1_kmap = kmap(0, grids[0], offs1, unit=1)
    self_kmaps = tuple(kmap(i, grids[i], offs3, unit=2 ** i)
                       for i in range(n_levels))
    down_kmaps = tuple(kmap(i, grids[i + 1], offs3, unit=2 ** i)
                       for i in range(n_levels - 1))
    # The 6D edge path derives up maps from the down edge sets (transpose =
    # same edges, in/out swapped) — no dense up builds needed there. The 3D
    # path derives them too, by scatter (up_from_down): K*M_coarse scatter
    # stores replace K*M_fine table probes, which were the dense plan's
    # biggest element-gather line (dense_grid.py:94, ~17 ms/pair on chip).
    edgify = ndim == 6 and EDGE_CONV_6D
    up_kmaps = () if edgify else tuple(
        up_from_down(down_kmaps[i], grids[i].capacity)
        for i in range(n_levels - 1))
    pool_down: Tuple[jnp.ndarray, ...] = ()
    pool_up: Tuple[jnp.ndarray, ...] = ()
    if with_pooling:
        offs2 = kernel_map.kernel_offsets(2, ndim, kernel_map.HYPER_CUBE)
        pool_down = tuple(kmap(i, grids[i + 1], offs2, unit=2 ** i)
                          for i in range(n_levels - 1))
        pool_up = tuple(up_from_down(pool_down[i], grids[i].capacity)
                        for i in range(n_levels - 1))
    overflow = tables[0].overflow
    for t in tables[1:]:
        overflow = jnp.logical_or(overflow, t.overflow)
    if edgify:
        conv1_kmap, self_kmaps, down_kmaps, up_kmaps, eo = _edgify_6d(
            grids, conv1_kmap, self_kmaps, down_kmaps,
            d_cap0=max(_D_CAP_6D, min(conv1_kernel_size ** 3, 2 * _D_CAP_6D)))
        overflow = jnp.logical_or(overflow, eo)
    return UNetPlan(grids=tuple(grids), conv1_kmap=conv1_kmap,
                    self_kmaps=self_kmaps, down_kmaps=down_kmaps,
                    up_kmaps=up_kmaps, pool_down=pool_down, pool_up=pool_up,
                    overflow=overflow, conv1_ones=conv1_ones)


# Edge-compacted convolution for 6D maps (ops/edge_conv). Module-level switch
# so equivalence tests can build the dense variant.
EDGE_CONV_6D = True

# Per-row edge capacity for 6D edge-compacted convs. Level-0 correspondence
# grids have unique c0 per row, so the true bound is 27 (one candidate per 3D
# c0-offset); deeper/strided levels use this cap with the overflow flag.
_D_CAP_6D = 64
_EDGE_TILE = 128
# Members per distinct strided c0 in the deeper-level multimaps
# (ops/paired_kernel_map.PairMultiMap), per level; beyond-cap rows drop with
# overflow. Measured at 3DMatch scale (tools/degree_probe.py, 30k pts):
# level-1 multiplicity max 8, level-2 max 37, level-3 max 121 (p999 118) — so
# level 3 gets 128 (the round-2 cap of 64 dropped edges on EVERY bench pair).
# The flat-row member layout costs one row gather per probe regardless of B
# (rows just widen), so wider deep-level caps are ~free in probe time.
_B_CAP_6D = (2, 8, 64, 128)
# Per-row edge caps (exactness) and live-edge budgets (cost) for the paired
# 6D plan, from tools/degree_probe.py at 3DMatch scale in BOTH correspondence
# regimes — they stress different levels:
#   random matching (untrained features, grids barely merge): per-row self
#     degree max 5/8/26/156, mean 1.05/1.3/5.4/43 over ~11-14k rows/level;
#   aligned matching (--aligned, the trained-weights upper bound where every
#     spatially consistent 3D neighbor is a 6D edge, grids merge ~4x/level):
#     self max 23/53/81/86, mean 9.0/25.9/35.4/41.7 over 14k/9k/3.6k/1.1k
#     rows; worst measured TILE-PADDED live extents (the quantity the budget
#     actually bounds, r5 probe with _live_extent): self 162k/266k/168k/90k,
#     down 107k/101k/90k slots — all well inside the budgets below at the
#     bench config (level_shrink_6d=1 keeps cap=16384 at every level, so
#     e.g. self L1 = 18*16384 + 93312 = 388k slots vs 266k measured).
# A cap bounds one ROW's degree; the budget bounds the map's TOTAL edges,
# which is what sizes product buffers and zero-fills — so caps sit above the
# worst per-row max and budgets above the worst tile-padded extent, each
# with >=1.3x headroom on the data-dependent component. The r4 bench tripped
# overflow on trained-weights pairs; the r5 TRAINED-matching probe
# (tools/degree_probe.py --weights, grids pinned in
# tests/data/bench_c6_trained.npz) showed the regime is WORSE than both
# extremes at depth — partial alignment keeps more rows at L3 (~5-7k) with
# aligned-like concentration: self-degree max 197/177/112 and live extents
# self 77-385k / down 59-104k across the four bench seeds, vs the aligned
# regime's L3 max of 86. Caps below clear those maxima; VERDICT r4 #2.
# Overruns still drop edges and raise the overflow flag.
_SELF_CAP_6D = (27, 64, 96, 256)
_DOWN_CAP_6D = (24, 64, 96)
_SELF_BUDGET_6D = (12, 18, 16, 48)
_DOWN_BUDGET_6D = (8, 6, 6)
# Spatially-keyed 6D multimap members: a probe then fetches the member rows
# of a row's whole 3^3 offset neighborhood under ONE gather index
# (ops/paired_kernel_map.build_multimap dense_members), eliminating the
# group-id lookups AND the [A, M] member row gathers — the remaining
# per-index gather costs of the deep-level plan builds. Costs
# cells * 3 * b_slots words of transient HBM per level, capped below.
# DEFAULT OFF until measured on chip (r5 tunnel died first): flip after
# tools/stage_budget.py confirms it wins. The flag only changes layout;
# edge sets are equality-tested both ways (test_paired_kernel_map).
DENSE_MEMBERS_6D = False
_DENSE_MEMBER_WORD_CAP = 256 * 1024 * 1024  # 1 GB of uint32 per level, max

# Per-(3D offset, output row) verified-edge cap, by MULTIMAP level (0 = no
# group compaction). The multimap probe yields B = _B_CAP_6D member slots per
# (a, j) but the verified count is tiny — max 4/10/20 at levels 1/2/3 on the
# pinned trained-matching bench grids (tools/per_offset_hits.py; the aligned
# regime is the same or lower). Compacting B -> this cap first shrinks the
# per-row d_cap compaction einsum by 4-5.3x at bench shape with >= 1.6x
# headroom on the measured max (r5 trace: those einsums were 110 ms of the
# 474 ms pair device total). Beyond-cap edges drop with the overflow flag.
_AJ_CAP_6D = (0, 0, 16, 32)


def _edgify_6d(grids, conv1_kmap, self_kmaps, down_kmaps,
               d_cap0: int, d_cap_self0: int = _D_CAP_6D):
    """Convert 6D dense kernel maps into edge-compacted form (ops/edge_conv):
    FLOPs then track actual correspondence-graph edges instead of 729 * M.
    Up maps come from the down edge sets (in/out swap) — no dense up builds."""
    from ..ops import edge_conv as ec

    overflow = jnp.asarray(False)

    def conv(km, out_grid, d_cap):
        nonlocal overflow
        em = ec.build_edge_map(km, d_cap=d_cap, tile=_EDGE_TILE)
        overflow = jnp.logical_or(overflow, em.overflow)
        return ec.SizedEdgeMap(em, out_grid.capacity)

    conv1 = conv(conv1_kmap, grids[0], d_cap0)
    self0 = conv1 if self_kmaps[0] is conv1_kmap and d_cap_self0 >= d_cap0 \
        else conv(self_kmaps[0], grids[0], d_cap_self0)
    selfs = (self0,) + tuple(conv(self_kmaps[i], grids[i], _D_CAP_6D)
                             for i in range(1, len(self_kmaps)))
    downs, ups = [], []
    for i in range(len(down_kmaps)):
        dn, up = ec.build_edge_maps_down_up(down_kmaps[i], d_cap=_D_CAP_6D,
                                            tile=_EDGE_TILE)
        overflow = jnp.logical_or(overflow, dn.overflow)
        downs.append(ec.SizedEdgeMap(dn, grids[i + 1].capacity))
        ups.append(ec.SizedEdgeMap(up, grids[i].capacity))
    return conv1, selfs, tuple(downs), tuple(ups), overflow


def up_from_down(down_kmap: jnp.ndarray, m_fine: int) -> jnp.ndarray:
    """Transpose kernel map [K, M_fine] derived from the forward down map.

    down[k, p] = i means c_fine_i = c_coarse_p + off_k * unit, which is
    exactly the transpose query c_coarse_p = c_fine_j - off_k * unit
    (ops/kernel_map.py transpose sign flip) answered for j = i at the SAME
    offset index k — so the up map is a scatter of the down map's edges, no
    table probes. For fixed (k, i) the coarse coordinate is determined, so at
    most one p writes each slot (no scatter races). Matches
    build_kernel_map(..., transpose=True) exactly wherever the down build's
    tables had no overflow (both enumerate the identical edge set)."""
    k_total, m_coarse = down_kmap.shape
    src = jnp.broadcast_to(
        jnp.arange(m_coarse, dtype=jnp.int32)[None, :], down_kmap.shape)
    tgt = jnp.where(down_kmap >= 0, down_kmap, m_fine)
    up = jnp.full((k_total, m_fine + 1), -1, jnp.int32)
    up = up.at[jnp.arange(k_total, dtype=jnp.int32)[:, None], tgt].set(
        src, mode="drop")
    return up[:, :m_fine]


def identity_kmap(grid: Grid) -> jnp.ndarray:
    idx = jnp.arange(grid.capacity, dtype=jnp.int32)
    return jnp.where(grid.valid_mask(), idx, -1)[None, :]


import jax as _jax

identity_kmap_batched = _jax.vmap(identity_kmap)


def build_paired_unet_plan(c0: "jnp.ndarray", c1: "jnp.ndarray", num,
                           conv1_kernel_size: int, region_type: int,
                           n_levels: int, level_shrink: int = 2,
                           dense_extent=None,
                           budget_scale: float = 1.0) -> UNetPlan:
    """UNet plan for the 6D correspondence grid of the inlier net.

    Level-0 kernel maps (the conv1 map and the k3 self map — by far the
    heaviest, 729 offsets for HYPER_CUBE) go through the paired fast path
    (ops/paired_kernel_map.py: 3D lookups + compares, exploiting the
    uniqueness of c0 per row). Deeper levels use the generic hash tables.

    budget_scale (static): multiplies the measured-at-3DMatch-scale edge
    budgets AND per-row degree caps (_SELF/_DOWN_BUDGET/CAP_6D). Clouds much
    denser than the 3DMatch bench shape (e.g. the synthetic room trajectories,
    tools/degree_probe.py --room: level-2 self mean 26-31 edges/row vs the
    bench-tuned budget of 16) need ~2.5 to run exact; the default keeps the
    bench config's buffer sizes untouched.
    """
    from ..ops import paired_kernel_map

    ndim = 6
    offs3 = kernel_map.kernel_offsets(3, ndim, region_type)
    offs1 = kernel_map.kernel_offsets(conv1_kernel_size, ndim, region_type)
    grid0 = Grid(coords=jnp.concatenate([c0, c1], axis=1), num=num)

    grids = [grid0]
    for level in range(1, n_levels):
        cap = max(grid0.capacity // (level_shrink ** level), 128)
        grids.append(sparse_grid.stride_down(grids[-1], 2 ** level, out_capacity=cap))

    if EDGE_CONV_6D:
        # No 6D hash tables at all: level 0 uses the unique-c0 slot builder;
        # every deeper map comes from a per-level 3D-keyed multimap (27 3D
        # probes + in-row candidate verification instead of 729 6D probes —
        # the round-2 hardware trace's dominant cost). Up maps come from the
        # down edge sets (in/out swap) — no dense transpose builds.
        from ..ops import edge_conv as ec

        overflow = jnp.asarray(False)

        def budget(per_row, cap, k_total):
            # Budgets trade exactness headroom for buffer size, which only
            # matters at bench scale; small grids (tests, tiny clouds) are
            # dense relative to their capacity and keep full buffers.
            # The budget is measured against the TILE-PADDED live extent
            # (edge_conv._edges_to_tiles: every populated offset bin rounds up
            # to a whole tile), so it must carry a k_total * tile structural
            # allowance on top of the real-edge allowance — at 729 offsets
            # and 128-slot tiles the padding alone reaches ~93k slots, which
            # silently consumed the whole down-map budget on most bench pairs
            # (the round-2 per-pair ov6 warnings). Padding tiles are skipped
            # at compute; the wider buffer costs HBM only.
            if cap < 4096:
                return None
            return int(per_row * budget_scale) * cap + k_total * _EDGE_TILE

        # Group-size bound: exactly 8^level rows can share a strided c0
        # (level-0 c0 is unique), capped per level from measured histograms
        # (beyond-cap edges drop with the overflow flag raised).
        def b_slots(level):
            cap = _B_CAP_6D[min(level, len(_B_CAP_6D) - 1)]
            return int(min(8 ** level, cap)) if level else 2

        # Dense-grid c0 keys when the 3D box is bounded (one int32 gather per
        # probe instead of a packed hash-bucket row gather — the dominant
        # plan-build cost on chip); hash keys otherwise. Boxes carry a pad
        # border so the 27 first-half offsets of a probe ride ONE patch
        # gather index per row (ops/dense_grid.PATCH_GATHER; level 0 pads
        # for the conv1 cube too).
        def ext(level):
            if dense_extent is None:
                return None
            return tuple(max(-(-int(e) // (1 << level)), 1)
                         for e in dense_extent)

        def pad6(level):
            # +1 beyond the kernel radius: down-probe centers (floor-strided
            # coarser c0) can sit one cell below the level's data region.
            return max(2, conv1_kernel_size // 2 + 1) if level == 0 else 2

        def pext(level):
            if dense_extent is None:
                return None
            from ..ops import dense_grid
            return dense_grid.padded_extent(ext(level), pad6(level))

        import numpy as _np

        def dense_mem(level):
            if not DENSE_MEMBERS_6D or dense_extent is None:
                return False
            from ..ops import dense_grid
            cells = int(_np.prod(dense_grid.padded_extent(ext(level),
                                                          pad6(level))))
            return cells * 3 * b_slots(level) <= _DENSE_MEMBER_WORD_CAP

        mms = []
        for i, g in enumerate(grids):
            mm = paired_kernel_map.build_multimap(
                g.coords[:, :3], g.coords[:, 3:], g.num, b_slots(i),
                dense_extent=ext(i), log2_stride=i, pad=pad6(i),
                dense_members=dense_mem(i))
            overflow = jnp.logical_or(overflow, mm.overflow)
            mms.append(mm)

        # conv1 kernels wider than 3 probe (ks/3)^3 more offsets per row;
        # scale its budget with the probe count. Level 0's c0 is unique, so
        # the level-0 multimap's table doubles as the paired probe's c0
        # table (group id == row index there) — one build, shared.
        conv1_per_row = _SELF_BUDGET_6D[0] * max(conv1_kernel_size ** 3 // 27,
                                                 1)
        sk, si = paired_kernel_map.build_edge_slots_paired(
            c0, c1, num, offs1, table0=mms[0].table, dense_extent=pext(0),
            pad=pad6(0))
        conv1_kmap = ec.SizedEdgeMap(
            ec.build_edge_map_from_slots(
                sk, si, offs1.shape[0], tile=_EDGE_TILE,
                live_cap=budget(conv1_per_row, grid0.capacity, offs1.shape[0])),
            grid0.capacity)
        if conv1_kernel_size == 3:
            self0 = conv1_kmap
        else:
            sk, si = paired_kernel_map.build_edge_slots_paired(
                c0, c1, num, offs3, table0=mms[0].table, dense_extent=pext(0),
                pad=pad6(0))
            self0 = ec.SizedEdgeMap(
                ec.build_edge_map_from_slots(
                    sk, si, offs3.shape[0], tile=_EDGE_TILE,
                    live_cap=budget(_SELF_BUDGET_6D[0], grid0.capacity, offs3.shape[0])),
                grid0.capacity)

        # Per-level edge capacity: the tile sort/scatter work is proportional
        # to M * d_cap, so shallow levels stay tight where measured degrees
        # allow (tools/degree_probe.py at 3DMatch scale — self-degree max
        # 8/26/156 at levels 1/2/3, down-degree max 8/26). Level 3 must hold
        # its full ~156 self-degree: the round-2 cap of 64 truncated edges on
        # every bench pair (VERDICT r2 #2).
        def self_cap(level):
            return int(_SELF_CAP_6D[min(level, len(_SELF_CAP_6D) - 1)]
                       * budget_scale)

        def down_cap(level):
            return int(_DOWN_CAP_6D[min(level, len(_DOWN_CAP_6D) - 1)]
                       * budget_scale)

        def aj_cap(level, capacity):
            # Tiny grids (tests, small clouds) skip group compaction like the
            # budgets skip: exactness there is cheap, and degenerate dense
            # grids can exceed the bench-measured per-(a, j) maxima.
            c = _AJ_CAP_6D[min(level, len(_AJ_CAP_6D) - 1)]
            if not c or capacity < 4096:
                return None
            return int(c * budget_scale)

        selfs = [self0]
        for i in range(1, n_levels):
            sk, si, so = paired_kernel_map.edge_slots_from_multimap(
                mms[i], grids[i].coords[:, :3], grids[i].coords[:, 3:],
                grids[i].num, offs3, unit=2 ** i,
                dense_extent=pext(i), log2_stride=i,
                group_cap=aj_cap(i, grids[i].capacity), pad=pad6(i),
                dense_members=dense_mem(i))
            overflow = jnp.logical_or(overflow, so)
            em = ec.build_edge_map_from_slots(
                sk, si, offs3.shape[0], tile=_EDGE_TILE, d_cap=self_cap(i),
                live_cap=budget(
                    _SELF_BUDGET_6D[min(i, len(_SELF_BUDGET_6D) - 1)],
                    grids[i].capacity, offs3.shape[0]))
            overflow = jnp.logical_or(overflow, em.overflow)
            selfs.append(ec.SizedEdgeMap(em, grids[i].capacity))
        self_kmaps = tuple(selfs)

        downs, ups = [], []
        for i in range(n_levels - 1):
            sk, si, so = paired_kernel_map.edge_slots_from_multimap(
                mms[i], grids[i + 1].coords[:, :3], grids[i + 1].coords[:, 3:],
                grids[i + 1].num, offs3, unit=2 ** i,
                dense_extent=pext(i), log2_stride=i,
                group_cap=aj_cap(i, grids[i].capacity), pad=pad6(i),
                probe_margin=1, dense_members=dense_mem(i))
            overflow = jnp.logical_or(overflow, so)
            dn, up = ec.build_edge_maps_down_up_from_slots(
                sk, si, offs3.shape[0], tile=_EDGE_TILE, d_cap=down_cap(i),
                live_cap=budget(
                    _DOWN_BUDGET_6D[min(i, len(_DOWN_BUDGET_6D) - 1)],
                    grids[i + 1].capacity, offs3.shape[0]))
            overflow = jnp.logical_or(overflow, dn.overflow)
            downs.append(ec.SizedEdgeMap(dn, grids[i + 1].capacity))
            ups.append(ec.SizedEdgeMap(up, grids[i].capacity))
        down_kmaps, up_kmaps = tuple(downs), tuple(ups)
    else:
        tables = [hashing.build_table(g.coords, g.num) for g in grids]
        conv1_kmap = paired_kernel_map.build_kernel_map_paired(c0, c1, num, offs1)
        self0 = conv1_kmap if conv1_kernel_size == 3 else \
            paired_kernel_map.build_kernel_map_paired(c0, c1, num, offs3)
        self_kmaps = (self0,) + tuple(
            kernel_map.build_kernel_map(tables[i], grids[i], offs3, unit=2 ** i)
            for i in range(1, n_levels))
        down_kmaps = tuple(
            kernel_map.build_kernel_map(tables[i], grids[i + 1], offs3, unit=2 ** i)
            for i in range(n_levels - 1))
        up_kmaps = tuple(
            kernel_map.build_kernel_map(tables[i + 1], grids[i], offs3,
                                        unit=2 ** i, transpose=True)
            for i in range(n_levels - 1))
        overflow = tables[0].overflow
        for t in tables[1:]:
            overflow = jnp.logical_or(overflow, t.overflow)
    return UNetPlan(grids=tuple(grids), conv1_kmap=conv1_kmap,
                    self_kmaps=self_kmaps, down_kmaps=down_kmaps,
                    up_kmaps=up_kmaps, overflow=overflow)
