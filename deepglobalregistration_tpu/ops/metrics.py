"""Registration metrics: rotation/translation errors, success criteria, pdist.

Reference: core/metrics.py:11-69, scripts/test_3dmatch.py:38-46 (rte_rre).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# HIGHEST everywhere: the platform's default matmul precision is bf16-level
# for f32 operands (see ops/se3.py) — metric matmuls must be f32-exact.
_HI = jax.lax.Precision.HIGHEST


def rotation_error(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """arccos((tr(R1^T R2) - 1) / 2), clamped as the reference (metrics.py:15-17)."""
    tr = jnp.trace(jnp.matmul(R1.T, R2, precision=_HI))
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -0.9999, 0.9999))


def translation_error(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum((t1 - t2) ** 2))


def batch_rotation_error(rots1: jnp.ndarray, rots2: jnp.ndarray) -> jnp.ndarray:
    """Batched geodesic rotation error; clamp +/-0.999 matches metrics.py:25-34.

    rots1/rots2: [B, 3, 3] or [B, 9].
    """
    tr = jnp.sum(rots1.reshape(-1, 9) * rots2.reshape(-1, 9), axis=1)
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -0.999, 0.999))


def batch_translation_error(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(t1 - t2, axis=1)


def rte_rre(T_pred: jnp.ndarray, T_gt: jnp.ndarray, rte_thresh: float,
            rre_thresh_deg: float):
    """Success criterion + errors (scripts/test_3dmatch.py:38-46).

    Returns (success, rte, rre_deg).
    """
    rte = jnp.linalg.norm(T_pred[:3, 3] - T_gt[:3, 3])
    rre = jnp.rad2deg(rotation_error(T_pred[:3, :3], T_gt[:3, :3]))
    return (rte < rte_thresh) & (rre < rre_thresh_deg), rte, rre


def corr_dist(est: jnp.ndarray, gth: jnp.ndarray, xyz0: jnp.ndarray,
              weight: jnp.ndarray | None = None, max_dist: float = 1.0,
              mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean clipped distance between points under two transforms (metrics.py:53-59)."""
    a = jnp.matmul(xyz0, est[:3, :3].T, precision=_HI) + est[:3, 3]
    b = jnp.matmul(xyz0, gth[:3, :3].T, precision=_HI) + gth[:3, 3]
    d = jnp.minimum(jnp.sqrt(jnp.sum((a - b) ** 2, axis=1)), max_dist)
    if weight is not None:
        d = d * weight
    if mask is None:
        return jnp.mean(d)
    m = mask.astype(jnp.float32)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def pdist(A: jnp.ndarray, B: jnp.ndarray, dist_type: str = "L2") -> jnp.ndarray:
    """Dense pairwise distances (metrics.py:62-69). Prefer ops/knn.py for large N."""
    d2 = jnp.sum(A ** 2, 1)[:, None] - 2 * jnp.matmul(A, B.T, precision=_HI) \
        + jnp.sum(B ** 2, 1)[None, :]
    d2 = jnp.maximum(d2, 0.0)
    if dist_type == "L2":
        return jnp.sqrt(d2 + 1e-7)
    if dist_type == "SquareL2":
        return d2
    raise NotImplementedError(dist_type)
