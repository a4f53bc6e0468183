"""SE(3)/Procrustes/KNN/loss/metric tests vs scipy+torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

from deepglobalregistration_tpu.ops import knn, losses, metrics, procrustes, se3


def _random_rigid(rng):
    R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
    t = rng.randn(3).astype(np.float32)
    return R, t


def test_ortho2rotation_produces_valid_rotations(rng):
    poses = jnp.asarray(rng.randn(8, 6).astype(np.float32))
    R = np.asarray(se3.ortho2rotation(poses))
    for r in R:
        np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99
    # Embedding roundtrip: rot6d(R) -> R
    R0, _ = _random_rigid(rng)
    back = np.asarray(se3.ortho2rotation(se3.rotation_to_rot6d(jnp.asarray(R0))[None]))[0]
    np.testing.assert_allclose(back, R0, atol=1e-5)


def test_weighted_procrustes_recovers_transform(rng):
    R, t = _random_rigid(rng)
    n, cap = 300, 384
    X = rng.randn(n, 3).astype(np.float32)
    Y = X @ R.T + t
    w = rng.rand(n).astype(np.float32) + 0.1
    Xp = np.zeros((cap, 3), np.float32)
    Yp = rng.randn(cap, 3).astype(np.float32)  # garbage padding
    wp = np.zeros(cap, np.float32)
    Xp[:n], Yp[:n], wp[:n] = X, Y, w
    Rhat, that = jax.jit(procrustes.weighted_procrustes)(
        jnp.asarray(Xp), jnp.asarray(Yp), jnp.asarray(wp))
    np.testing.assert_allclose(np.asarray(Rhat), R, atol=2e-5)
    np.testing.assert_allclose(np.asarray(that), t, atol=2e-5)


def test_weighted_procrustes_with_noise_matches_numpy_f64_oracle(rng):
    R, t = _random_rigid(rng)
    n = 500
    X = rng.randn(n, 3).astype(np.float32)
    Y = X @ R.T + t + 0.05 * rng.randn(n, 3).astype(np.float32)
    w = rng.rand(n).astype(np.float32)

    # float64 oracle replicating the reference formulation (registration.py:91-113)
    w64 = w.astype(np.float64)
    wn = w64 / (np.abs(w64).sum() + np.finfo(np.float32).eps)
    mux = (wn[:, None] * X).sum(0)
    muy = (wn[:, None] * Y).sum(0)
    Sxy = (Y - muy).T @ (wn[:, None] * (X - mux))
    U, _, Vt = np.linalg.svd(Sxy)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R_ref = U @ S @ Vt
    t_ref = muy - R_ref @ mux

    Rhat, that = procrustes.weighted_procrustes(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(Rhat), R_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(that), t_ref, atol=1e-4)


def test_procrustes_reflection_case(rng):
    # Nearly-planar clouds exercise the det-sign fix.
    X = rng.randn(50, 3).astype(np.float32)
    X[:, 2] *= 0.001
    R, t = _random_rigid(rng)
    Y = X @ R.T + t
    Rhat, that = procrustes.procrustes(jnp.asarray(X), jnp.asarray(Y))
    assert np.linalg.det(np.asarray(Rhat)) > 0.99
    np.testing.assert_allclose(np.asarray(Y), X @ np.asarray(Rhat).T + np.asarray(that), atol=1e-3)


def test_find_nn_matches_kdtree(rng):
    n0, n1, c = 200, 300, 16
    F0 = rng.randn(n0, c).astype(np.float32)
    F1 = rng.randn(n1, c).astype(np.float32)
    cap0, cap1 = 256, 384
    F0p = np.zeros((cap0, c), np.float32); F0p[:n0] = F0
    F1p = rng.randn(cap1, c).astype(np.float32); F1p[:n1] = F1  # garbage padding
    idx, d = jax.jit(knn.find_nn)(jnp.asarray(F0p), jnp.asarray(F1p),
                                  jnp.int32(n0), jnp.int32(n1))
    ref_d, ref_i = cKDTree(F1).query(F0)
    np.testing.assert_array_equal(np.asarray(idx)[:n0], ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d)[:n0]), ref_d, rtol=1e-3, atol=1e-4)
    assert np.isinf(np.asarray(d)[n0:]).all()


def test_find_nn_small_tile(rng):
    F0 = rng.randn(64, 8).astype(np.float32)
    F1 = rng.randn(100, 8).astype(np.float32)
    idx, _ = knn.find_nn(jnp.asarray(F0), jnp.asarray(F1), jnp.int32(64), jnp.int32(100), tile=16)
    _, ref_i = cKDTree(F1).query(F0)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_find_knn_matches_kdtree(rng):
    F0 = rng.randn(80, 8).astype(np.float32)
    F1 = rng.randn(120, 8).astype(np.float32)
    k = 3
    idx, d = knn.find_knn(jnp.asarray(F0), jnp.asarray(F1), jnp.int32(80), jnp.int32(120),
                          k=k, tile=32)
    ref_d, ref_i = cKDTree(F1).query(F0, k=k)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d)), ref_d, rtol=1e-3, atol=1e-4)


def test_bce_losses_match_torch(rng):
    import torch

    logits = rng.randn(100).astype(np.float32)
    labels = (rng.rand(100) > 0.7).astype(np.float32)

    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(labels))
    got = losses.unbalanced_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    # balanced: per-class means averaged over 2 classes
    crit = torch.nn.BCEWithLogitsLoss()
    ref_bal = sum(
        float(crit(torch.from_numpy(logits[labels == i]), torch.from_numpy(labels[labels == i]))) / 2
        for i in (0, 1))
    got_bal = losses.balanced_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got_bal), ref_bal, rtol=1e-5)

    # masked variant ignores padding
    pad_logits = np.concatenate([logits, rng.randn(20).astype(np.float32) * 100])
    pad_labels = np.concatenate([labels, np.ones(20, np.float32)])
    mask = np.arange(120) < 100
    got_masked = losses.unbalanced_loss(jnp.asarray(pad_logits), jnp.asarray(pad_labels),
                                        jnp.asarray(mask))
    np.testing.assert_allclose(float(got_masked), float(ref), rtol=1e-5)


def test_high_dim_smooth_l1_matches_reference_formula(rng):
    X = rng.randn(60, 3).astype(np.float32) * 2
    Y = rng.randn(60, 3).astype(np.float32) * 2
    w = rng.rand(60).astype(np.float32)
    q = 0.1
    eps = np.finfo(np.float32).eps
    sq = (((X - Y) / q) ** 2).sum(1)
    use = 0.5 * (sq < 1)
    ref = (0.5 - use) * (np.sqrt(sq + eps) - 0.5) + use * sq
    ref_w = (ref * w).sum() / w.sum()
    got = losses.high_dim_smooth_l1(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w),
                                    quantization_size=q)
    np.testing.assert_allclose(float(got), ref_w, rtol=1e-4)
    got_u = losses.high_dim_smooth_l1(jnp.asarray(X), jnp.asarray(Y), quantization_size=q)
    np.testing.assert_allclose(float(got_u), ref.mean(), rtol=1e-4)


def test_metrics_and_transforms(rng):
    R1, t1 = _random_rigid(rng)
    R2, t2 = _random_rigid(rng)
    ang = np.arccos(np.clip((np.trace(R1.T @ R2) - 1) / 2, -0.9999, 0.9999))
    got = float(metrics.rotation_error(jnp.asarray(R1), jnp.asarray(R2)))
    np.testing.assert_allclose(got, ang, rtol=1e-4)

    T = np.asarray(se3.rt_to_matrix(jnp.asarray(R1), jnp.asarray(t1)))
    Tinv = np.asarray(se3.matrix_inverse_se3(jnp.asarray(T)))
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-5)

    xyz = rng.randn(20, 3).astype(np.float32)
    got = np.asarray(se3.apply_transform(jnp.asarray(xyz), jnp.asarray(T)))
    np.testing.assert_allclose(got, xyz @ R1.T + t1, atol=1e-5)

    ok, rte, rre = metrics.rte_rre(jnp.asarray(T), jnp.asarray(T), 0.3, 15.0)
    assert bool(ok) and float(rte) < 1e-6


def test_random_rotation_is_rotation():
    R = np.asarray(se3.random_rotation(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99
