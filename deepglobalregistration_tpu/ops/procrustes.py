"""Closed-form (weighted) Procrustes SE(3) solvers — fully on-device.

Reference: core/registration.py:67-113. The reference hops to CPU float64 for
the 3x3 SVD (registration.py:105); on TPU we stay on device: points are centered
first (which conditions the 3x3 cross-covariance well) and the SVD of the tiny
3x3 runs in float32. An optional one-step polar polish tightens orthogonality to
~1e-7, which is far below the pipeline's success thresholds (RTE 0.3 m / RRE 15
deg) and the published TE of a few cm.

All solvers support padded inputs via a weight/mask vector and are batchable
with jax.vmap (used by the trainer's per-pair Procrustes loss and by RANSAC's
thousands of 4-point hypotheses).

Precision: every matmul here carries ``Precision.HIGHEST``. The platform's
default matmul precision is bf16-level even for f32 operands, which turned
U @ D @ Vt (orthogonal factors to 1e-7) into a matrix with det drifting by
~1e-3 per product — compounding to percent-scale determinant drift over an
ICP run. See ops/se3.py's module note.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _fix_det_svd(Sxy: jnp.ndarray) -> jnp.ndarray:
    """R = U diag(1, 1, det(U)det(V)) V^T from the 3x3 cross-covariance."""
    U, _, Vt = jnp.linalg.svd(Sxy.astype(jnp.float32))
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(det)
    return _mm(_mm(U, D), Vt)


def _polar_polish(R: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Newton iteration toward the nearest orthogonal matrix: R <- 1.5 R - 0.5 R R^T R."""
    def body(_, r):
        return 1.5 * r - 0.5 * _mm(_mm(r, r.T), r)
    return jax.lax.fori_loop(0, iters, body, R)


def weighted_procrustes(X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray,
                        eps: float = 1.1920929e-07) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted closed-form rigid alignment: find R, t minimizing sum w |RX + t - Y|^2.

    Matches core/registration.py:91-113 exactly in formulation:
    W1 = sum|w|; wn = w / (W1 + eps); mux = sum(wn X); muy = sum(wn Y);
    Sxy = (Y - muy)^T diag(wn) (X - mux); R from det-fixed SVD; t = muy - R mux.

    Padded rows are excluded by giving them w = 0.
    X, Y: [N, 3]; w: [N]. Returns (R [3,3], t [3]).
    """
    w = w.astype(jnp.float32)
    X = X.astype(jnp.float32)
    Y = Y.astype(jnp.float32)
    W1 = jnp.sum(jnp.abs(w))
    wn = (w / (W1 + eps))[:, None]
    mux = jnp.sum(wn * X, axis=0, keepdims=True)
    muy = jnp.sum(wn * Y, axis=0, keepdims=True)
    Sxy = _mm((Y - muy).T, wn * (X - mux))
    R = _polar_polish(_fix_det_svd(Sxy))
    t = muy[0] - _mm(R, mux[0])
    return R, t


def procrustes(X: jnp.ndarray, Y: jnp.ndarray,
               mask: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unweighted closed-form alignment (core/registration.py:67-88).

    With a boolean mask, masked-out rows are ignored (uniform weight on the rest).
    """
    if mask is None:
        w = jnp.ones(X.shape[0], jnp.float32)
    else:
        w = mask.astype(jnp.float32)
    return weighted_procrustes(X, Y, w)


# Batched variants (vmap-materialized here for convenient importing)
weighted_procrustes_batch = jax.vmap(weighted_procrustes, in_axes=(0, 0, 0))
procrustes_batch = jax.vmap(procrustes, in_axes=(0, 0, 0))
