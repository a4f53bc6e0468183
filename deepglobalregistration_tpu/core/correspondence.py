"""Correspondence ground-truth labeling (core/correspondence.py:14-53).

Marks each predicted correspondence pair (i, j) as correct when it appears in
the ground-truth positive-pair set. The reference hashes pairs with
``sum(col_d * M^d)``, M = max(N0, N1), and uses np.isin on the host. Here the
pair set membership test runs on device through the same bucketed coordinate
tables used by the sparse conv engine (a pair is a 2-D integer "coordinate").
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import hashing


def _widen_pairs(pairs: jnp.ndarray) -> jnp.ndarray:
    """Split each point index across two 16-bit hash fields.

    The coordinate hash clamps each field to [-32768, 32766]; raw point
    indices >= 32767 would clamp to one packed value and silently collide
    (clouds bucket up to 131072 voxels). Mapping index i -> (i >> 15 - 2^15,
    (i & 0x7FFF) - 2^15) keeps both fields strictly in range for any
    i < 2^30, so the 4-column key stays exact."""
    hi = (pairs >> 15) - 32768
    lo = (pairs & 0x7FFF) - 32768
    return jnp.stack([hi[..., 0], lo[..., 0], hi[..., 1], lo[..., 1]], axis=-1)


def find_correct_correspondence(pos_pairs: jnp.ndarray, pos_num: jnp.ndarray,
                                pred_pairs: jnp.ndarray, pred_num: jnp.ndarray) -> jnp.ndarray:
    """Membership of predicted pairs in the GT positive set (single cloud pair).

    pos_pairs: [P, 2] int32 padded GT pairs; pred_pairs: [Q, 2] int32 padded.
    Returns bool [Q]; padding rows are False. Batch via jax.vmap.
    """
    table = hashing.build_table(_widen_pairs(pos_pairs), pos_num)
    q_valid = jnp.arange(pred_pairs.shape[0], dtype=jnp.int32) < pred_num
    found = hashing.lookup(table, _widen_pairs(pred_pairs), query_valid=q_valid)
    return found >= 0


def find_correct_correspondence_np(pos_pairs: np.ndarray, pred_pairs: np.ndarray) -> np.ndarray:
    """Host-side oracle with the reference's exact hash formulation
    (core/correspondence.py:14-26), for tests and host data paths."""
    m = int(max(pos_pairs.max(initial=0), pred_pairs.max(initial=0)) + 1)
    pos_keys = pos_pairs[:, 0].astype(np.int64) + pos_pairs[:, 1].astype(np.int64) * m
    pred_keys = pred_pairs[:, 0].astype(np.int64) + pred_pairs[:, 1].astype(np.int64) * m
    return np.isin(pred_keys, pos_keys)
