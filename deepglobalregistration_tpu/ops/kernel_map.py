"""Kernel-offset generation and kernel-map construction for sparse convolution.

TPU-native replacement for MinkowskiEngine's kernel maps (the in/out index pairs
a generalized sparse convolution gathers over; built in C++ hash maps in the
reference's MinkowskiEngine dependency — SURVEY.md section 2.2).

A kernel map here is a dense padded buffer ``idx[K, M]``: for output row j and
kernel offset k, ``idx[k, j]`` is the input row whose coordinate equals the
output coordinate displaced by offset k (or -1 when that input site is empty or
j is padding). The sparse convolution then runs K gather-GEMM accumulations —
each one an MXU-friendly [M, Cin] x [Cin, Cout] matmul.

Offset conventions (centralized here so checkpoint-parity tests can flip them in
one place):
- HYPER_CUBE enumerates the D-dimensional cube with dimension 0 varying fastest,
  from the most-negative corner — matching MinkowskiEngine's kernel_region
  odometer order used by its (K, Cin, Cout) kernel weight layout.
- HYPER_CROSS enumerates the center first, then per dimension (in order) the
  offsets -r..-1, 1..r.
- Transposed convolution: slot k of a transpose conv connects coarse input p to
  fine output o when o = p + offset_k * unit, i.e. the query displacement sign
  flips relative to the forward conv (ME builds transpose maps by iterating the
  region around the *input* coordinates).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from . import hashing
from .sparse_grid import Grid

HYPER_CUBE = 0
HYPER_CROSS = 1

# Cap on elements per lookup batch; larger maps chunk over offsets.
_MAX_QUERY_ELEMS = 1 << 21


def kernel_offsets(kernel_size: int, ndim: int, region_type: int = HYPER_CUBE,
                   dilation: int = 1) -> np.ndarray:
    """Static [K, D] integer offsets of a kernel region (unit tensor stride)."""
    if kernel_size % 2 == 0:
        # Even kernels (ME convention: offsets in [0, k)) — used by the k2/s2
        # sum-pooling of the ResUNetSP variants (resunet.py:256,298).
        if region_type != HYPER_CUBE:
            raise NotImplementedError("even kernels only defined for HYPER_CUBE")
        ranges = [np.arange(0, kernel_size) for _ in range(ndim)]
        mesh = np.meshgrid(*reversed(ranges), indexing="ij")
        offs = np.stack([m.ravel() for m in reversed(mesh)], axis=1)
        return (offs * dilation).astype(np.int32)
    r = kernel_size // 2
    if region_type == HYPER_CUBE:
        ranges = [np.arange(-r, r + 1) for _ in range(ndim)]
        # dimension 0 fastest: build with reversed dim order, then flip columns
        mesh = np.meshgrid(*reversed(ranges), indexing="ij")
        offs = np.stack([m.ravel() for m in reversed(mesh)], axis=1)
    elif region_type == HYPER_CROSS:
        rows = [np.zeros((1, ndim), np.int64)]
        for d in range(ndim):
            for step in list(range(-r, 0)) + list(range(1, r + 1)):
                row = np.zeros((1, ndim), np.int64)
                row[0, d] = step
                rows.append(row)
        offs = np.concatenate(rows, axis=0)
    else:
        raise ValueError(f"unknown region type {region_type}")
    return (offs * dilation).astype(np.int32)


def build_kernel_map(in_table: hashing.CoordTable, out_grid: Grid,
                     offsets: np.ndarray, unit: int,
                     transpose: bool = False) -> jnp.ndarray:
    """Build the padded kernel map idx[K, M] from an input coord table.

    in_table:  hash table over the input grid's coordinates.
    out_grid:  output coordinates [M, D] (+ valid count).
    offsets:   static [K, D] kernel offsets (see kernel_offsets()).
    unit:      tensor stride multiplying the offsets — the *input* tensor stride
               for forward convs, the *output* tensor stride for transpose convs
               (both equal the finer of the two strides).
    transpose: flip the displacement sign (adjoint map; see module docstring).
    """
    k, d = offsets.shape
    m = out_grid.capacity
    sign = -1 if transpose else 1
    offs = offsets * unit * sign  # static numpy [K, D]
    out_valid = out_grid.valid_mask()
    # Lane-friendly layout: per-dimension [c, M] query arrays (M in the vector
    # lanes) instead of [c*M, D] rows (see hashing.pack_cols layout note).
    out_cols = tuple(out_grid.coords[:, i] for i in range(d))

    chunk = max(1, min(k, _MAX_QUERY_ELEMS // max(m, 1)))
    if chunk >= k:
        off_d = jnp.asarray(offs, dtype=jnp.int32)
        qcols = tuple(out_cols[i][None, :] + off_d[:, i][:, None] for i in range(d))
        qv = jnp.broadcast_to(out_valid[None, :], (k, m))
        return hashing.lookup_cols(in_table, qcols, query_valid=qv)

    # Scan over offset chunks (vs unrolling ~12 lookup stages for a 729-offset
    # 6D map — keeps XLA graphs small; see sparse_conv for the same pattern).
    n_chunks = -(-k // chunk)
    pad = n_chunks * chunk - k
    offs_p = np.concatenate([offs, np.zeros((pad, d), offs.dtype)], axis=0)
    offs_c = jnp.asarray(offs_p.reshape(n_chunks, chunk, d), dtype=jnp.int32)

    def body(_, off_chunk):
        qcols = tuple(out_cols[i][None, :] + off_chunk[:, i][:, None]
                      for i in range(d))
        qv = jnp.broadcast_to(out_valid[None, :], (chunk, m))
        return None, hashing.lookup_cols(in_table, qcols, query_valid=qv)

    _, maps = jax.lax.scan(body, None, offs_c)
    return maps.reshape(n_chunks * chunk, m)[:k]


def self_kernel_map(grid: Grid, table: hashing.CoordTable, kernel_size: int,
                    ndim: int, region_type: int, tensor_stride: int,
                    dilation: int = 1) -> jnp.ndarray:
    """Kernel map of a stride-1 conv on its own coordinate set."""
    offs = kernel_offsets(kernel_size, ndim, region_type, dilation)
    return build_kernel_map(table, grid, offs, unit=tensor_stride)
