"""Point-to-point ICP polish — jitted, matching Open3D semantics.

Replaces o3d.pipelines.registration.registration_icp (reference usage:
deep_global_registration.py:317-322 with max_correspondence_distance =
2 * voxel_size; kitti_loader.py:151-153 for GT refinement). Each iteration:
nearest target neighbor of every transformed source point (tiled spatial scan,
ops/knn.py), gate by max distance, closed-form Procrustes on the gated pairs.
Convergence mirrors o3d ICPConvergenceCriteria defaults: max_iteration=30,
relative_fitness=1e-6, relative_rmse=1e-6.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import knn, procrustes, se3


class ICPResult(NamedTuple):
    T: jnp.ndarray  # [4, 4]
    fitness: jnp.ndarray
    inlier_rmse: jnp.ndarray
    iterations: jnp.ndarray


def registration_icp(source: jnp.ndarray, target: jnp.ndarray, num_src: jnp.ndarray,
                     num_tgt: jnp.ndarray, max_correspondence_distance: float,
                     init: jnp.ndarray | None = None, max_iteration: int = 30,
                     relative_fitness: float = 1e-6,
                     relative_rmse: float = 1e-6,
                     f32_rmse_floor: float = 1e-3,
                     use_pallas: bool = False) -> ICPResult:
    """source/target: [N, 3] padded; init: [4, 4] initial transform.
    use_pallas: fused 1-NN kernel for the per-iteration spatial scan (TPU,
    non-vmapped call sites only).
    f32_rmse_floor: relative rmse-delta floor compensating f32's Procrustes
    noise (see the body comment); 0 restores o3d's exact absolute-epsilon
    criteria (which in f32 runs all max_iteration scans). The pose impact of
    the floor is bounded by tools/icp_deviation.py."""
    n = source.shape[0]
    T0 = jnp.eye(4, dtype=jnp.float32) if init is None else init.astype(jnp.float32)
    src_valid = jnp.arange(n, dtype=jnp.int32) < num_src
    thresh2 = max_correspondence_distance ** 2

    def evaluate(T):
        moved = se3.apply_transform(source, T)
        idx, d2 = knn.find_nn(moved, target, num_src, num_tgt,
                              use_pallas=use_pallas)
        inl = (d2 < thresh2) & src_valid
        cnt = jnp.sum(inl.astype(jnp.float32))
        fitness = cnt / jnp.maximum(jnp.sum(src_valid.astype(jnp.float32)), 1.0)
        rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(cnt, 1.0))
        return idx, d2, fitness, rmse

    idx0, d20, fit0, rmse0 = evaluate(T0)

    def cond(carry):
        T, idx, d2, fit, rmse, i, done = carry
        return (i < max_iteration) & jnp.logical_not(done)

    def body(carry):
        # ONE spatial scan per iteration: the correspondences found when
        # evaluating T_new double as the next iteration's update input
        # (they are exactly what a fresh scan at T would recompute).
        T, idx, d2, fit, rmse, i, _ = carry
        moved = se3.apply_transform(source, T)
        w = ((d2 < thresh2) & src_valid).astype(jnp.float32)
        # o3d estimates the *update* on already-moved points, composed into T.
        R, t = procrustes.weighted_procrustes(moved, target[idx], w)
        T_new = se3.rt_to_matrix(R, t) @ T
        idx_new, d2_new, fit_new, rmse_new = evaluate(T_new)
        # o3d's criteria assume f64: its per-iteration motion converges to
        # ~1e-15 so |drmse| < 1e-6 fires within a few stable iterations. In
        # f32 the Procrustes update has a ~1e-6-rotation noise floor and the
        # rmse delta jitters right at the epsilon, so the loop would always
        # run max_iteration scans (measured: 30/30 on chip at fitness 1.0).
        # A relative floor (1e-3 of the current rmse) stops once per-
        # iteration motion is noise (~3e-6 absolute measured on chip at
        # 3 cm rmse) — the residual drift over the remaining iterations is
        # a few percent of rmse at most, far below the success thresholds.
        rmse_eps = jnp.maximum(relative_rmse, rmse_new * f32_rmse_floor)
        done = (jnp.abs(fit_new - fit) < relative_fitness) & \
               (jnp.abs(rmse_new - rmse) < rmse_eps)
        return (T_new, idx_new, d2_new, fit_new, rmse_new, i + 1, done)

    init_carry = (T0, idx0, d20, fit0, rmse0, jnp.int32(0), jnp.bool_(False))
    T, _, _, fit, rmse, i, _ = jax.lax.while_loop(cond, body, init_carry)
    return ICPResult(T=T, fitness=fit, inlier_rmse=rmse, iterations=i)
