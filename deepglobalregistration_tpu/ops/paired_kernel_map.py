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

Deeper pyramid levels lose the uniqueness property after striding and fall
back to the generic 6D hash tables (models/unet_plan.py).
"""

from __future__ import annotations

import numpy as np

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
                            offsets: np.ndarray, unit: int = 1):
    """Slot-form edges of the paired 6D self map: (slot_k, slot_in), each
    [S, N] with S = number of distinct first-half 3D offsets (27 for k3).

    Per (3D offset a, row j) there is at most ONE candidate input row (c0 is
    unique), whose kernel-offset index k is decided by the observed second-half
    displacement d1 = c1[cand] - c1[j] via a STATIC (a, d1) -> k table. This
    feeds ops/edge_conv.build_edge_map_from_slots directly — no dense [729, N]
    map and no per-row compaction sort.
    """
    k, d = offsets.shape
    assert d == 6
    n = c0.shape[0]
    offs = np.asarray(offsets) * unit
    off0, inv0 = np.unique(offs[:, :3], axis=0, return_inverse=True)
    k0n = len(off0)

    # static (a, boxed d1) -> canonical offset index table
    lo1 = offs[:, 3:].min(axis=0)
    box = (offs[:, 3:].max(axis=0) - lo1) // unit + 1
    tab = np.full((k0n, int(box[0] * box[1] * box[2])), -1, np.int32)
    for kk in range(k):
        p = (offs[kk, 3:] - lo1) // unit
        tab[inv0[kk], int(p[0] + box[0] * (p[1] + box[1] * p[2]))] = kk

    table0 = hashing.build_table(c0, num)
    valid = jnp.arange(n, dtype=jnp.int32) < num
    cols0 = tuple(c0[:, i] for i in range(3))
    qcols = tuple(cols0[i][None, :] + jnp.asarray(off0[:, i], jnp.int32)[:, None]
                  for i in range(3))
    qv = jnp.broadcast_to(valid[None, :], (k0n, n))
    cand = hashing.lookup_cols(table0, qcols, query_valid=qv)  # [k0n, N]
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
    slot_k = jnp.where(in_box,
                       jnp.asarray(tab)[jnp.arange(k0n)[:, None], pidx], -1)
    slot_in = jnp.where(slot_k >= 0, cand, -1)
    return slot_k.astype(jnp.int32), slot_in.astype(jnp.int32)
