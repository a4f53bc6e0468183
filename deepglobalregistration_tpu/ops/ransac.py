"""Safeguard RANSAC registration — vectorized hypothesis search on device.

Replaces the reference's Open3D RANSAC fallback (deep_global_registration.py:
50-64, invoked at :302-315 with distance_threshold = 2 * voxel_size and 80000
validations): thousands of 4-point correspondence hypotheses are evaluated in
parallel — each hypothesis is a batched unweighted Procrustes fit plus an
inlier count over all correspondences — an embarrassingly parallel workload the
MXU/VPU chews through in a few launches, versus Open3D's sequential C++ loop.

Semantics matched at the behavior level (o3d TransformationEstimationPointToPoint
with ransac_n=4, inlier = correspondence within distance_threshold, best model
by (fitness, -rmse), final re-estimation on the best model's inliers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import procrustes


class RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    fitness: jnp.ndarray  # inlier fraction among valid correspondences
    inlier_rmse: jnp.ndarray


def _count_inliers(R, t, X, Y, valid, thresh):
    # HIGHEST: the platform's default matmul precision is bf16-level for f32
    # (see ops/se3.py) — unguarded, inlier counting at mm thresholds would
    # see ~0.2% coordinate noise.
    d2 = jnp.sum((jnp.matmul(X, R.T, precision=jax.lax.Precision.HIGHEST)
                  + t - Y) ** 2, axis=1)
    inl = (d2 < thresh * thresh) & valid
    cnt = jnp.sum(inl.astype(jnp.float32))
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(cnt, 1.0))
    return inl, cnt, rmse


def _checker_distance_ok(Rs, ts, sx, sy, checker_distance: float):
    """o3d CorrespondenceCheckerBasedOnDistance over each hypothesis's own
    sampled correspondences: every sampled pair must lie within
    checker_distance after applying the hypothesis transform (o3d prunes such
    hypotheses before the full-set validation). Rs [H,3,3], ts [H,3],
    sx/sy [H,4,3] -> ok [H] bool."""
    moved = jnp.einsum("hij,hkj->hki", Rs, sx,
                       precision=jax.lax.Precision.HIGHEST) + ts[:, None, :]
    d2 = jnp.sum((moved - sy) ** 2, axis=-1)  # [H, 4]
    return jnp.all(d2 < checker_distance * checker_distance, axis=1)


def ransac_correspondence(key: jax.Array, X: jnp.ndarray, Y: jnp.ndarray,
                          num: jnp.ndarray, distance_threshold: float,
                          num_hypotheses: int = 16384,
                          refine_rounds: int = 2,
                          checker_distance: float | None = None) -> RansacResult:
    """Robust rigid fit of correspondences (X[i] <-> Y[i]), padded to [N, 3].

    num_hypotheses plays the role of o3d's validation budget (the reference
    passes 80000; on TPU all hypotheses evaluate in parallel, so the budget is
    a quality knob, not a latency knob).

    checker_distance: when set, applies o3d's
    CorrespondenceCheckerBasedOnDistance — hypotheses whose own sampled
    correspondences misfit beyond this distance are rejected before scoring.
    The reference's correspondence-mode safeguard passes NO checkers
    (deep_global_registration.py:50-64) so the default here is None; the
    feature-matching mode passes the threshold (:44-46).
    """
    n = X.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < num

    # Sample 4 correspondence indices per hypothesis among the valid ones.
    samples = jax.random.randint(key, (num_hypotheses, 4), 0, jnp.maximum(num, 1))
    sx = X[samples]  # [H, 4, 3]
    sy = Y[samples]

    Rs, ts = procrustes.procrustes_batch(sx, sy, jnp.ones(samples.shape, jnp.float32))

    def score(R, t):
        _, cnt, rmse = _count_inliers(R, t, X, Y, valid, distance_threshold)
        return cnt, rmse

    cnts, rmses = jax.vmap(score)(Rs, ts)
    if checker_distance is not None:
        ok = _checker_distance_ok(Rs, ts, sx, sy, checker_distance)
        cnts = jnp.where(ok, cnts, -1.0)
    # Best by highest inlier count, then lowest rmse (o3d fitness/rmse order).
    order = cnts - rmses / (rmses + 1.0)  # rmse tie-break without a lexicographic sort
    best = jnp.argmax(order)
    R, t = Rs[best], ts[best]

    # Final re-estimation on the inlier set (fixed rounds; each is closed-form).
    def refit(_, rt):
        R, t = rt
        inl, _, _ = _count_inliers(R, t, X, Y, valid, distance_threshold)
        return procrustes.weighted_procrustes(X, Y, inl.astype(jnp.float32))

    R, t = jax.lax.fori_loop(0, refine_rounds, refit, (R, t))
    inl, cnt, rmse = _count_inliers(R, t, X, Y, valid, distance_threshold)
    fitness = cnt / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return RansacResult(R=R, t=t, fitness=fitness, inlier_rmse=rmse)


def ransac_feature_matching(key: jax.Array, xyz0, xyz1, feats0, feats1,
                            num0, num1, distance_threshold: float,
                            num_hypotheses: int = 16384,
                            use_pallas: bool = False) -> RansacResult:
    """Feature-matching RANSAC variant (deep_global_registration.py:29-47):
    build 1-NN feature correspondences first, then run correspondence RANSAC
    with o3d's distance checker (the reference passes
    CorrespondenceCheckerBasedOnDistance(distance_threshold) in this mode,
    deep_global_registration.py:44-46; the correspondence mode runs
    checker-free, :50-64).

    (The reference's fcgf_feature_matching safeguard branch actually calls an
    undefined symbol — deep_global_registration.py:229 — so this is the repaired
    behavior of the intended path.)
    """
    from . import knn

    idx, _ = knn.find_nn(feats0, feats1, num0, num1, use_pallas=use_pallas)
    return ransac_correspondence(key, xyz0, xyz1[idx], num0, distance_threshold,
                                 num_hypotheses=num_hypotheses,
                                 checker_distance=distance_threshold)
