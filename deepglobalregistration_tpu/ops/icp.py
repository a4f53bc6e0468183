"""Point-to-point ICP polish — jitted, matching Open3D semantics.

Replaces o3d.pipelines.registration.registration_icp (reference usage:
deep_global_registration.py:317-322 with max_correspondence_distance =
2 * voxel_size; kitti_loader.py:151-153 for GT refinement). Each iteration:
nearest target neighbor of every transformed source point, gate by max
distance, closed-form Procrustes on the gated pairs. Convergence mirrors o3d
ICPConvergenceCriteria defaults: max_iteration=30, relative_fitness=1e-6,
relative_rmse=1e-6.

Nearest-neighbor strategy: the full tiled spatial scan (ops/knn.py) costs
~2.5 ms per iteration at 16k x 16k on chip — 75+ ms across o3d's 30
iterations, the pipeline's single most expensive stage after the nets. ICP
only ever USES neighbors within max_correspondence_distance, so the loop
instead precomputes per-source CANDIDATE LISTS once: target points bucketed
into cells of that size (a cell-key sort + binary search, no hash table),
each source point gathering its 27 neighboring cells' points (<= 8 per cell:
with max_corr = 2 * voxel — both reference call sites — a cell holds at most
2^3 voxel-unique points, so the cap is exact). Iterations then reduce over
the fixed [N, 216, 3] candidate array: pure elementwise work, no N^2 scan,
no per-iteration gathers. Exactness: candidates are taken around each
source point's INITIAL pose; the 27-cell neighborhood covers the
correspondence ball of any pose within ~one cell of it, and the polish
starts from a converged registration, so motion is micrometers-to-
millimeters. ``cand_ok`` flags when total motion exceeds a conservative
quarter-cell bound (callers may warn or rerun with use_candidates=False,
which restores the full-scan path).
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
    cand_ok: jnp.ndarray = True  # candidate lists stayed valid (see module doc)


def _build_candidates(moved0: jnp.ndarray, target: jnp.ndarray,
                      num_tgt: jnp.ndarray, cell: float,
                      cap_per_cell: int = 8):
    """Per-source candidate target lists: for each source point (at its
    initial pose), the target points in the 27 cells around it.

    Returns (cand_idx [N0, 27*cap] int32, cand_xyz [N0, 27*cap, 3] f32,
    overflow bool). Absent slots carry idx -1 and far-away sentinel coords
    (distance reductions need no masking). overflow fires when a cell holds
    more than cap_per_cell targets (impossible for voxel-unique targets with
    cell = 2 * voxel)."""
    n0 = moved0.shape[0]
    n1 = target.shape[0]
    tgt_valid = jnp.arange(n1, dtype=jnp.int32) < num_tgt
    inv = jnp.float32(1e6)  # sentinel: d2 ~ 1e12, never the argmin

    # 10-bit cell coordinates relative to the valid-target min, offset +2 so
    # source neighborhoods (-1) and clamping stay in range.
    tc_raw = jnp.floor(target / cell).astype(jnp.int32)
    base = jnp.min(jnp.where(tgt_valid[:, None], tc_raw, 2 ** 20), axis=0) - 2

    def key_of(c):
        c = jnp.clip(c, 0, 1021)
        return (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]

    # Sentinel above every real key (key_of clips to < 2^30) but small enough
    # that rank_join's 2k+1 bias stays inside int32.
    key_t = jnp.where(tgt_valid, key_of(tc_raw - base), jnp.int32(1_073_000_000))
    iota1 = jnp.arange(n1, dtype=jnp.int32)
    skey, sperm = jax.lax.sort((key_t, iota1), num_keys=1)

    sc = jnp.floor(moved0 / cell).astype(jnp.int32) - base  # [N0, 3]
    d = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2, dtype=jnp.int32)] * 3),
                               indexing="ij"), axis=-1).reshape(27, 3)
    nk = key_of(sc[:, None, :] + d[None, :, :])  # [N0, 27]

    def rank_join(side_right: bool):
        """#sorted-target-keys {<, <=} each query key, by SORT-MERGE: a
        searchsorted with 27*N0 queries lowers elementwise on this backend
        (~97 ms per side at bench shape); one payload sort ranks every query
        at once. Keys are < 2^30 (key_of clips), so 2k+-1 fits int32: the
        bias orders a query after (right) or before (left) equal targets."""
        qk = nk.reshape(-1) * 2 + (1 if side_right else -1)
        allk = jnp.concatenate([skey * 2, qk])
        tot = allk.shape[0]
        orig = jnp.arange(tot, dtype=jnp.int32)
        _, so = jax.lax.sort((allk, orig), num_keys=1)
        pref = jnp.cumsum((so < n1).astype(jnp.int32))
        _, ranks = jax.lax.sort((so, pref), num_keys=1)
        return ranks[n1:].reshape(nk.shape)

    starts = rank_join(False)
    counts = rank_join(True) - starts
    overflow = jnp.any((counts > cap_per_cell) & (nk < 2 ** 30))

    j = jnp.arange(cap_per_cell, dtype=jnp.int32)
    slot = starts[..., None] + j  # [N0, 27, cap]
    valid = j < jnp.minimum(counts, cap_per_cell)[..., None]
    cand_idx = jnp.where(valid, sperm[jnp.minimum(slot, n1 - 1)], -1)
    cand_idx = cand_idx.reshape(n0, -1)
    cand_xyz = jnp.where((cand_idx >= 0)[..., None],
                         target[jnp.maximum(cand_idx, 0)], inv)
    return cand_idx, cand_xyz, overflow


def registration_icp(source: jnp.ndarray, target: jnp.ndarray, num_src: jnp.ndarray,
                     num_tgt: jnp.ndarray, max_correspondence_distance: float,
                     init: jnp.ndarray | None = None, max_iteration: int = 30,
                     relative_fitness: float = 1e-6,
                     relative_rmse: float = 1e-6,
                     f32_rmse_floor: float = 0.0,
                     use_pallas: bool = False,
                     use_candidates: bool = False) -> ICPResult:
    """source/target: [N, 3] padded; init: [4, 4] initial transform.
    use_candidates: cell-bucketed candidate-list neighbor search (see module
    doc) — ~10x cheaper per iteration but requires a near-converged init
    (the pipeline polish opts in; check cand_ok). Default False = the full
    per-iteration spatial scan, exact for any init.
    use_pallas: fused 1-NN kernel for the full-scan path (TPU only; keep
    False from vmapped callers — the kernel inside this while_loop is
    unvalidated under vmap on hardware, see ops/knn.pallas_ok).
    f32_rmse_floor: optional relative rmse-delta floor. Default 0.0 = o3d's
    exact absolute-epsilon criteria. Historical note: a 1e-3 floor shipped
    while the platform's default matmul precision silently ran f32 geometry
    at bf16 (~1e-3 per-iteration Procrustes noise kept the absolute epsilon
    from ever firing). With Precision.HIGHEST geometry (ops/procrustes.py,
    ops/se3.py) the o3d criteria fire naturally (measured: convergence at
    iter ~9 with err-vs-GT 0.0 deg where the noisy build ran 30/30);
    tools/icp_deviation.py quantifies both settings."""
    n = source.shape[0]
    T0 = jnp.eye(4, dtype=jnp.float32) if init is None else init.astype(jnp.float32)
    src_valid = jnp.arange(n, dtype=jnp.int32) < num_src
    thresh2 = max_correspondence_distance ** 2

    if use_candidates:
        moved0 = se3.apply_transform(source, T0)
        cand_idx, cand_xyz, cand_overflow = _build_candidates(
            moved0, target, num_tgt, cell=max_correspondence_distance)

        def find(moved):
            d2 = jnp.sum((moved[:, None, :] - cand_xyz) ** 2, axis=-1)
            jbest = jnp.argmin(d2, axis=1)
            d2min = jnp.take_along_axis(d2, jbest[:, None], axis=1)[:, 0]
            idx = jnp.take_along_axis(cand_idx, jbest[:, None], axis=1)[:, 0]
            nn_xyz = jnp.take_along_axis(cand_xyz, jbest[:, None, None],
                                         axis=1)[:, 0]
            return idx, d2min, nn_xyz
    else:
        def find(moved):
            idx, d2 = knn.find_nn(moved, target, num_src, num_tgt,
                                  use_pallas=use_pallas)
            return idx, d2, target[idx]

    def evaluate(T):
        moved = se3.apply_transform(source, T)
        idx, d2, nn_xyz = find(moved)
        inl = (d2 < thresh2) & src_valid
        cnt = jnp.sum(inl.astype(jnp.float32))
        fitness = cnt / jnp.maximum(jnp.sum(src_valid.astype(jnp.float32)), 1.0)
        rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(cnt, 1.0))
        return idx, d2, nn_xyz, fitness, rmse

    idx0, d20, nn0, fit0, rmse0 = evaluate(T0)

    drift_bound = 0.25 * max_correspondence_distance

    def cond(carry):
        T, idx, d2, nn_xyz, fit, rmse, i, done, stale = carry
        return (i < max_iteration) & jnp.logical_not(done | stale)

    def body(carry):
        # ONE neighbor search per iteration: the correspondences found when
        # evaluating T_new double as the next iteration's update input
        # (they are exactly what a fresh search at T would recompute).
        T, idx, d2, nn_xyz, fit, rmse, i, _, stale = carry
        moved = se3.apply_transform(source, T)
        w = ((d2 < thresh2) & src_valid).astype(jnp.float32)
        # o3d estimates the *update* on already-moved points, composed into T.
        R, t = procrustes.weighted_procrustes(moved, nn_xyz, w)
        T_new = jnp.matmul(se3.rt_to_matrix(R, t), T,
                           precision=jax.lax.Precision.HIGHEST)
        idx_new, d2_new, nn_new, fit_new, rmse_new = evaluate(T_new)
        # With Precision.HIGHEST geometry matmuls, f32 per-iteration motion
        # converges below the absolute 1e-6 epsilon within a few stable
        # iterations, exactly as o3d's f64 criteria intend — the optional
        # f32_rmse_floor (default 0 = o3d semantics) remains only as a knob
        # for experiments; see the docstring's historical note.
        rmse_eps = jnp.maximum(relative_rmse, rmse_new * f32_rmse_floor)
        done_new = (jnp.abs(fit_new - fit) < relative_fitness) & \
                   (jnp.abs(rmse_new - rmse) < rmse_eps)
        if use_candidates:
            # Candidate lists were built at T0: once the pose drifts past the
            # quarter-cell bound their answers are no longer trustworthy, so
            # STOP iterating immediately — the checked wrapper's full-scan
            # fallback redoes the work anyway, and a far-off init (random
            # weights, coarse RANSAC) otherwise burns all 30 candidate
            # iterations before the rerun (round-4 bench: stale fired on
            # every pair, +53 ms/pair).
            moved_new = se3.apply_transform(source, T_new)
            drift2 = jnp.max(jnp.where(
                src_valid, jnp.sum((moved_new - moved0) ** 2, axis=1), 0.0))
            stale_new = stale | (drift2 > drift_bound ** 2)
        else:
            stale_new = stale
        # Per-element freeze for vmapped callers (register_batch): the
        # while_loop keeps running while ANY batch element is active, and
        # without the mask a done element would keep composing updates (and
        # could even flip done back off) — diverging from the sequential
        # register() answer on the same pair. Unvmapped, done is False here
        # (cond guarantees it), so this is the identity.
        done = carry[7]
        frz = lambda new, old: jnp.where(done, old, new)
        return (frz(T_new, T), frz(idx_new, idx), frz(d2_new, d2),
                frz(nn_new, nn_xyz), frz(fit_new, fit), frz(rmse_new, rmse),
                jnp.where(done, i, i + 1), jnp.where(done, done, done_new),
                jnp.where(done, stale, stale_new))

    init_carry = (T0, idx0, d20, nn0, fit0, rmse0, jnp.int32(0),
                  jnp.bool_(False), jnp.bool_(False))
    T, _, _, _, fit, rmse, i, _, stale = jax.lax.while_loop(
        cond, body, init_carry)

    cand_ok = jnp.bool_(True)
    if use_candidates:
        cand_ok = jnp.logical_not(cand_overflow) & jnp.logical_not(stale)
    return ICPResult(T=T, fitness=fit, inlier_rmse=rmse, iterations=i,
                     cand_ok=cand_ok)


def registration_icp_checked(source: jnp.ndarray, target: jnp.ndarray,
                             num_src: jnp.ndarray, num_tgt: jnp.ndarray,
                             max_correspondence_distance: float,
                             init: jnp.ndarray | None = None,
                             max_iteration: int = 30,
                             use_pallas: bool = False) -> ICPResult:
    """Candidate-list ICP with an on-device full-scan fallback.

    Runs the cheap candidate-list ICP first; when its exactness precondition
    fails (``cand_ok`` False — pose drift exceeded the quarter-cell bound, as
    a decimeters-off safeguard-RANSAC init can cause, or a candidate cell
    overflowed) the SAME program reruns the full per-iteration spatial scan
    from the same init via lax.cond, so callers always get the exact answer
    with one dispatch. The returned ``cand_ok`` reports whether the fallback
    fired (False = it did), for host-side warning at the result sync.

    NOT for vmapped callers: lax.cond under vmap executes both branches,
    paying the full scan unconditionally — register_batch instead surfaces
    cand_ok and reruns failing pairs through the sequential path."""
    res = registration_icp(source, target, num_src, num_tgt,
                           max_correspondence_distance, init=init,
                           max_iteration=max_iteration, use_pallas=use_pallas,
                           use_candidates=True)

    def keep(_):
        return res.T, res.fitness, res.inlier_rmse, res.iterations

    def full(_):
        r = registration_icp(source, target, num_src, num_tgt,
                             max_correspondence_distance, init=init,
                             max_iteration=max_iteration,
                             use_pallas=use_pallas, use_candidates=False)
        return r.T, r.fitness, r.inlier_rmse, r.iterations

    T, fit, rmse, iters = jax.lax.cond(res.cand_ok, keep, full, None)
    return ICPResult(T=T, fitness=fit, inlier_rmse=rmse, iterations=iters,
                     cand_ok=res.cand_ok)
