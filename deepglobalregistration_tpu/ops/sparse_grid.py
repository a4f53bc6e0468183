"""Sparse voxel grids over padded, statically-shaped buffers.

TPU-native replacement for MinkowskiEngine's coordinate manager:
- ``voxelize``: ME.utils.sparse_quantize with return_index
  (reference: core/deep_global_registration.py:152-158, dataloader usage).
- ``stride_down``: the coordinate-map downsampling a strided MinkowskiConvolution
  performs (output coords = unique floor-div of input coords by the new tensor
  stride, kept in input-scale units — ME 0.5 stride semantics).
- ``batched_coordinates``: ME.utils.batched_coordinates interop helper.

A ``Grid`` is a single cloud: integer coords [N, D] plus a valid-row count. The
tensor stride is *static* metadata threaded separately (it changes compiled
shapes/offsets, so it must not be a traced value). Batch via ``jax.vmap``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hashing


class Grid(NamedTuple):
    """A padded sparse coordinate set: ``coords[:num]`` are valid voxel coords."""

    coords: jnp.ndarray  # [N, D] int32 (multiples of the grid's tensor stride)
    num: jnp.ndarray  # scalar int32

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def ndim_space(self) -> int:
        return self.coords.shape[1]

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.num


def voxelize(xyz: jnp.ndarray, num: jnp.ndarray, voxel_size: float) -> Tuple[jnp.ndarray, Grid]:
    """Quantize a point cloud to one representative point per voxel.

    Matches reference preprocessing (core/deep_global_registration.py:134-161):
    voxel index = floor(xyz / voxel_size); one point kept per occupied voxel
    (we keep the smallest-index point deterministically); returns the selected
    raw points (padded rows zeroed) and the voxel Grid at tensor stride 1.

    xyz: [N, 3] float; num: valid row count.
    """
    coords_all = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    uniq, num_unique, src = hashing.unique_rows(coords_all, num)
    sel_valid = jnp.arange(xyz.shape[0], dtype=jnp.int32) < num_unique
    xyz_sel = jnp.where(sel_valid[:, None], xyz[src], 0.0)
    return xyz_sel, Grid(coords=uniq, num=num_unique)


def stride_down(grid: Grid, new_tensor_stride: int,
                out_capacity: int | None = None) -> Grid:
    """Downsample a coordinate map to a coarser tensor stride.

    Output coords are unique values of ``floor(c / s) * s`` (rounding toward
    -inf), still expressed in level-0 units — exactly ME's strided-conv output
    coordinate map (SURVEY.md section 2.2; resunet conv2/3/4 stride-2 chain).

    out_capacity: static padded size of the coarser grid (surface scans shrink
    ~4-8x per stride-2 level, so coarser levels can use smaller buffers; see
    hashing.unique_rows for the saturation behavior on overflow).
    """
    s = int(new_tensor_stride)
    if s & (s - 1) == 0:
        # Arithmetic shifts are exact floor-division for powers of two (all DGR
        # strides are), and dodge a platform miscompilation: jnp.floor_divide
        # (int32) fused into the dedup program produced dedup keyed on only the
        # first packed word on the axon TPU backend (jax 0.9.0, 2026-08) —
        # see tools/tpu_regression_checks.py.
        k = s.bit_length() - 1
        snapped = (grid.coords >> k) << k
    else:
        snapped = jax.lax.optimization_barrier(jnp.floor_divide(grid.coords, s) * s)
    uniq, num_unique, _ = hashing.unique_rows(snapped, grid.num, out_capacity=out_capacity)
    return Grid(coords=uniq, num=num_unique)


def batched_coordinates(grids: Tuple[Grid, ...]) -> np.ndarray:
    """ME.utils.batched_coordinates interop: concat clouds with a batch-index column.

    Host-side utility (reference: core/deep_global_registration.py:158,
    dataloader/base_loader.py:52-53). Returns [sum(num), 1+D] int32 numpy.
    """
    rows = []
    for b, g in enumerate(grids):
        n = int(g.num)
        c = np.asarray(g.coords)[:n]
        rows.append(np.concatenate([np.full((n, 1), b, np.int32), c], axis=1))
    if not rows:
        return np.zeros((0, 1), np.int32)
    return np.concatenate(rows, axis=0).astype(np.int32)
