"""Fused 1-nearest-neighbor Pallas kernel (TPU).

The pipeline's hottest scans are brute-force 1-NN passes: feature matching
(core/knn.py:23-74 in the reference) and EVERY ICP iteration (~30 spatial
scans per pair). The lax.scan formulation streams candidate tiles but leaves
tile scheduling and the min-reduction fusion to XLA; this kernel owns the
loop: a (query-tile, candidate-tile) grid where each step computes a
[TQ, TC] squared-distance block on the MXU in VMEM (f32 HIGHEST — bf16
cross-terms catastrophically cancel for exact self-matches) and folds it into
a running (min, argmin) held in the revisited output block. The full distance
matrix never exists in HBM.

Grid iteration order on TPU is sequential with the last axis fastest, so for
a fixed query tile i all candidate tiles j visit in order and the output
block for i acts as an accumulator (initialized at j == 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TQ = 512   # query rows per block
_TC = 1024  # candidate rows per block
_BIG = np.float32(3.4e38)


def _nn_kernel(num1_ref, f0_ref, f1_ref, d_ref, i_ref):
    j = pl.program_id(1)
    f0 = f0_ref[:]  # [TQ, C]
    f1 = f1_ref[:]  # [TC, C]

    # |f0 - f1|^2 = |f0|^2 - 2 f0.f1 + |f1|^2, cross term on the MXU in f32
    cross = jax.lax.dot_general(
        f0, f1, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [TQ, TC]
    n0sq = jnp.sum(f0 * f0, axis=1, keepdims=True)
    n1sq = jnp.sum(f1 * f1, axis=1, keepdims=True)
    d2 = n0sq - 2.0 * cross + n1sq.T

    # mask candidate padding (columns beyond num1)
    col = j * _TC + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2 = jnp.where(col < num1_ref[0], d2, _BIG)

    local_d = jnp.min(d2, axis=1)
    local_i = (j * _TC + jnp.argmin(d2, axis=1)).astype(jnp.int32)

    @pl.when(j == 0)
    def _():
        d_ref[0, 0, :] = local_d
        i_ref[0, 0, :] = local_i

    @pl.when(j > 0)
    def _():
        best_d = d_ref[0, 0, :]
        take = local_d < best_d
        d_ref[0, 0, :] = jnp.where(take, local_d, best_d)
        i_ref[0, 0, :] = jnp.where(take, local_i, i_ref[0, 0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def find_nn_pallas(F0: jnp.ndarray, F1: jnp.ndarray, num0: jnp.ndarray,
                   num1: jnp.ndarray, interpret: bool = False):
    """1-NN of every F0 row among the first num1 rows of F1.

    Same contract as ops/knn.find_nn: returns (idx [N0] int32, d2 [N0] f32);
    rows >= num0 return (0, +inf). Feature dim is padded to a multiple of 8,
    rows to the block sizes; padding never changes results (padded candidate
    columns are masked by num1 inside the kernel).
    """
    n0, c = F0.shape
    n1 = F1.shape[0]
    # Minimum 32 channels: a (rows, 8) block leaves the minor (lane) dim at 8
    # of 128, and Mosaic's resulting layout ran the xyz (c=3) case ~80x slower
    # than c=32 on chip (tools/nn_bench.py: 4.8 ms vs 0.06 ms for the SAME row
    # counts). Zero-padding channels never changes distances.
    cp = max(32, -(-c // 8) * 8)
    n0p = -(-n0 // _TQ) * _TQ
    n1p = -(-n1 // _TC) * _TC
    f0 = jnp.zeros((n0p, cp), jnp.float32).at[:n0, :c].set(
        F0.astype(jnp.float32))
    f1 = jnp.zeros((n1p, cp), jnp.float32).at[:n1, :c].set(
        F1.astype(jnp.float32))

    grid = (n0p // _TQ, n1p // _TC)
    d, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TQ, cp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, cp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Mosaic requires output block sublane dims divisible by 8 (or equal
        # to the array dim); a natural (1, TQ) per-query-tile block violates
        # that whenever grid[0] > 1, so the result row is carried in a rank-3
        # (1, 8, TQ) block — row 0 holds the data, rows 1-7 are sublane pad.
        out_specs=[
            pl.BlockSpec((1, 8, _TQ), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _TQ), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], 8, _TQ), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 8, _TQ), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray([num1], jnp.int32), f0, f1)

    d = d[:, 0, :].reshape(n0p)[:n0]
    idx = idx[:, 0, :].reshape(n0p)[:n0]
    q_valid = jnp.arange(n0, dtype=jnp.int32) < num0
    # exact scan-path parity: no valid candidate -> (0, +inf)
    matched = d < _BIG
    idx = jnp.where(q_valid & matched, idx, 0)
    d = jnp.where(q_valid & matched, d, np.float32(np.inf))
    return idx, d.astype(jnp.float32)
