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


def find_correct_correspondence(pos_pairs: jnp.ndarray, pos_num: jnp.ndarray,
                                pred_pairs: jnp.ndarray, pred_num: jnp.ndarray) -> jnp.ndarray:
    """Membership of predicted pairs in the GT positive set (single cloud pair).

    pos_pairs: [P, 2] int32 padded GT pairs; pred_pairs: [Q, 2] int32 padded.
    Returns bool [Q]; padding rows are False. Batch via jax.vmap.
    """
    table = hashing.build_table(pos_pairs, pos_num)
    q_valid = jnp.arange(pred_pairs.shape[0], dtype=jnp.int32) < pred_num
    found = hashing.lookup(table, pred_pairs, query_valid=q_valid)
    return found >= 0


def find_correct_correspondence_np(pos_pairs: np.ndarray, pred_pairs: np.ndarray) -> np.ndarray:
    """Host-side oracle with the reference's exact hash formulation
    (core/correspondence.py:14-26), for tests and host data paths."""
    m = int(max(pos_pairs.max(initial=0), pred_pairs.max(initial=0)) + 1)
    pos_keys = pos_pairs[:, 0].astype(np.int64) + pos_pairs[:, 1].astype(np.int64) * m
    pred_keys = pred_pairs[:, 0].astype(np.int64) + pred_pairs[:, 1].astype(np.int64) * m
    return np.isin(pred_keys, pos_keys)
