"""Losses: inlier BCE (plain + class-balanced) and high-dim smooth-L1.

Reference: core/loss.py:13-61, extended with validity masks for padded buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (stable formulation)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def unbalanced_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked-mean BCE (core/loss.py:13-21 UnbalancedLoss)."""
    per = bce_with_logits(logits, labels.astype(jnp.float32))
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def balanced_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Class-balanced BCE: mean within each class, averaged over present classes
    weighted 1/NUM_LABELS each (core/loss.py:24-39 BalancedLoss; an absent class
    contributes zero, matching the reference's `if torch.any(target_mask)` skip).
    """
    labels = labels.astype(jnp.float32)
    per = bce_with_logits(logits, labels)
    m = jnp.ones_like(per) if mask is None else mask.astype(jnp.float32)
    total = jnp.zeros((), jnp.float32)
    for cls in (0.0, 1.0):
        sel = m * (labels == cls)
        cnt = jnp.sum(sel)
        cls_mean = jnp.where(cnt > 0, jnp.sum(per * sel) / jnp.maximum(cnt, 1.0), 0.0)
        total = total + cls_mean / 2.0
    return total


def high_dim_smooth_l1(X: jnp.ndarray, Y: jnp.ndarray,
                       weights: jnp.ndarray | None = None,
                       quantization_size: float = 1.0,
                       eps: float = 1.1920929e-07,
                       w1: jnp.ndarray | None = None) -> jnp.ndarray:
    """Smooth-L1 over quantization-normalized squared point distances.

    Matches core/loss.py:42-61 HighDimSmoothL1Loss: with d2 the normalized
    squared distance per point, loss = 0.5*d2 where d2 < 1 else sqrt(d2+eps)-0.5;
    unweighted -> mean, weighted -> sum(w * loss) / sum(w). Padded rows are
    excluded by passing weight 0 (and, for the unweighted path, a weights vector
    of the 0/1 mask).
    """
    d2 = jnp.sum(((X - Y) / quantization_size) ** 2, axis=-1)
    use_sq = (d2 < 1.0).astype(jnp.float32) * 0.5
    loss = (0.5 - use_sq) * (jnp.sqrt(d2 + eps) - 0.5) + use_sq * d2
    if weights is None:
        return jnp.mean(loss)
    if w1 is None:
        w1 = jnp.sum(weights)
    return jnp.sum(loss * weights) / jnp.maximum(w1, eps)
