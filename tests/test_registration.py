"""Refinement loop / RANSAC / ICP / correspondence-labeling tests."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from deepglobalregistration_tpu.core import correspondence, registration
from deepglobalregistration_tpu.ops import icp, metrics, ransac, se3


def _rigid(rng, max_angle_deg=None):
    if max_angle_deg is None:
        R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
    else:
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        ang = np.deg2rad(max_angle_deg) * rng.rand()
        R = Rotation.from_rotvec(axis * ang).as_matrix().astype(np.float32)
    t = rng.randn(3).astype(np.float32) * 0.5
    return R, t


def test_global_registration_refines_noisy_init(rng):
    R, t = _rigid(rng)
    n, cap = 400, 512
    X = rng.randn(n, 3).astype(np.float32)
    Y = X @ R.T + t + 0.01 * rng.randn(n, 3).astype(np.float32)
    Xp = np.zeros((cap, 3), np.float32); Xp[:n] = X
    Yp = np.zeros((cap, 3), np.float32); Yp[:n] = Y
    w = np.zeros(cap, np.float32); w[:n] = 1.0
    # corrupt some correspondences with weight ~0 (clipped inliers)
    bad = rng.choice(n, 40, replace=False)
    Yp[bad] += 5.0
    w[bad] = 0.0

    res = jax.jit(lambda a, b, c: registration.global_registration(
        a, b, c, quantization_size=0.1))(jnp.asarray(Xp), jnp.asarray(Yp), jnp.asarray(w))
    # NOTE: rotation_error clamps cos at 0.9999 (reference metrics.py:17), which
    # floors reported RRE at 0.81 deg — compare R elementwise for a tighter check.
    rre = np.rad2deg(float(metrics.rotation_error(res.R, jnp.asarray(R))))
    rte = float(metrics.translation_error(res.t, jnp.asarray(t)))
    assert rre <= 0.82 and rte < 0.02
    np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-3)
    assert int(res.iterations) <= 1000


def test_global_registration_perfect_data_breaks_early(rng):
    R, t = _rigid(rng)
    X = rng.randn(200, 3).astype(np.float32)
    Y = X @ R.T + t
    w = np.ones(200, np.float32)
    res = registration.global_registration(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w),
                                           quantization_size=0.1)
    # perfect closed-form init -> loss tiny -> plateau/threshold exit early
    assert int(res.iterations) < 1000
    assert float(res.loss) < 1e-3


def test_ransac_recovers_under_70pct_outliers(rng):
    R, t = _rigid(rng)
    n, cap = 1000, 1024
    X = (rng.rand(n, 3) * 2).astype(np.float32)
    Y = X @ R.T + t
    n_out = int(n * 0.7)
    bad = rng.choice(n, n_out, replace=False)
    Y[bad] = rng.rand(n_out, 3) * 2
    Xp = np.zeros((cap, 3), np.float32); Xp[:n] = X
    Yp = np.zeros((cap, 3), np.float32); Yp[:n] = Y

    res = jax.jit(lambda k, a, b, m: ransac.ransac_correspondence(
        k, a, b, m, distance_threshold=0.05, num_hypotheses=2048))(
        jax.random.PRNGKey(0), jnp.asarray(Xp), jnp.asarray(Yp), jnp.int32(n))
    rre = np.rad2deg(float(metrics.rotation_error(res.R, jnp.asarray(R))))
    rte = float(metrics.translation_error(res.t, jnp.asarray(t)))
    assert rre < 1.0 and rte < 0.05
    assert 0.25 < float(res.fitness) < 0.45  # ~30% true inliers


def test_icp_polishes_coarse_init(rng):
    R, t = _rigid(rng, max_angle_deg=10)
    n, cap = 800, 1024
    src = (rng.rand(n, 3) * 2).astype(np.float32)
    tgt = src @ R.T + t
    perm = rng.permutation(n)
    tgt = tgt[perm]
    srcp = np.zeros((cap, 3), np.float32); srcp[:n] = src
    tgtp = np.zeros((cap, 3), np.float32); tgtp[:n] = tgt

    res = jax.jit(lambda s, g: icp.registration_icp(
        s, g, jnp.int32(n), jnp.int32(n), max_correspondence_distance=0.5))(
        jnp.asarray(srcp), jnp.asarray(tgtp))
    T_gt = np.asarray(se3.rt_to_matrix(jnp.asarray(R), jnp.asarray(t)))
    ok, rte, rre = metrics.rte_rre(res.T, jnp.asarray(T_gt), 0.05, 1.0)
    assert bool(ok), (float(rte), float(rre), int(res.iterations))
    assert float(res.fitness) > 0.99


def test_icp_identity_when_aligned(rng):
    src = (rng.rand(300, 3)).astype(np.float32)
    res = icp.registration_icp(jnp.asarray(src), jnp.asarray(src), jnp.int32(300),
                               jnp.int32(300), max_correspondence_distance=0.1)
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=1e-4)
    # f32 rmse flutter at the 1e-6 convergence threshold can take a few extra
    # iterations (o3d computes in f64 and stops at 1); just bound it well under 30.
    assert int(res.iterations) <= 8


def test_find_correct_correspondence_matches_reference_hash(rng):
    pos = rng.randint(0, 500, size=(300, 2)).astype(np.int32)
    pred = np.concatenate([pos[rng.choice(300, 100)],
                           rng.randint(0, 500, size=(150, 2)).astype(np.int32)], 0)
    rng.shuffle(pred)
    cap_p, cap_q = 384, 320
    posp = np.zeros((cap_p, 2), np.int32); posp[:300] = pos
    predp = np.zeros((cap_q, 2), np.int32); predp[:250] = pred

    got = np.asarray(correspondence.find_correct_correspondence(
        jnp.asarray(posp), jnp.int32(300), jnp.asarray(predp), jnp.int32(250)))
    ref = correspondence.find_correct_correspondence_np(pos, pred)
    np.testing.assert_array_equal(got[:250], ref)
    assert not got[250:].any()


def test_find_correct_correspondence_large_indices(rng):
    """Point indices above the 16-bit hash-field range (>= 32767) must stay
    distinct — regression for the clamp-collision bug where all large indices
    packed to one value and labels were silently corrupted."""
    n = 120000
    pos = rng.randint(0, n, size=(400, 2)).astype(np.int32)
    pred = np.concatenate([pos[rng.choice(400, 80)],
                           rng.randint(0, n, size=(220, 2)).astype(np.int32)], 0)
    rng.shuffle(pred)
    # adversarial near-collisions around the old clamp boundary
    pos[:4] = [[32766, 5], [32767, 5], [60000, 70000], [70000, 60000]]
    pred[:6] = [[32766, 5], [32767, 5], [32768, 5], [60000, 70000],
                [60001, 70000], [70000, 60000]]
    cap_p, cap_q = 512, 384
    posp = np.zeros((cap_p, 2), np.int32); posp[:400] = pos
    predp = np.zeros((cap_q, 2), np.int32); predp[:300] = pred
    got = np.asarray(correspondence.find_correct_correspondence(
        jnp.asarray(posp), jnp.int32(400), jnp.asarray(predp), jnp.int32(300)))
    ref = correspondence.find_correct_correspondence_np(pos, pred)
    np.testing.assert_array_equal(got[:300], ref)


def test_icp_candidates_match_full_scan(rng):
    """Candidate-list neighbor search (cell buckets around the initial pose)
    must reproduce the full-scan ICP exactly when the init is near-converged
    — the pipeline polish context (pose drift far below the cell size)."""
    # target = source + millimeter-scale residual: the polish context (the
    # refinement already solved the pose; ICP moves points < the quarter-cell
    # drift bound of 0.025 m at max_corr 0.1)
    n, cap = 600, 1024
    src = (rng.rand(n, 3) * 2).astype(np.float32)
    tgt = (src + np.float32([0.008, -0.005, 0.006]) +
           0.002 * rng.randn(n, 3)).astype(np.float32)
    srcp = np.zeros((cap, 3), np.float32); srcp[:n] = src
    tgtp = np.zeros((cap, 3), np.float32); tgtp[:n] = tgt

    def run(use_candidates):
        return jax.jit(lambda s, g: icp.registration_icp(
            s, g, jnp.int32(n), jnp.int32(n),
            max_correspondence_distance=0.1,
            use_candidates=use_candidates))(jnp.asarray(srcp),
                                            jnp.asarray(tgtp))

    full = run(False)
    cand = run(True)
    assert bool(cand.cand_ok)
    np.testing.assert_allclose(np.asarray(cand.T), np.asarray(full.T),
                               atol=1e-5)
    # Same answer; the stop ITERATION may differ by one — the o3d absolute
    # 1e-6 epsilon fires right at the f32 noise floor, where the candidate
    # and full-scan reduction orders round |drmse| differently.
    assert abs(int(cand.iterations) - int(full.iterations)) <= 1
    # reduction order differs (candidate array vs tiled scan): f32 noise
    np.testing.assert_allclose(float(cand.inlier_rmse),
                               float(full.inlier_rmse), atol=1e-5)


def test_icp_candidates_flag_large_drift(rng):
    """A coarse init that moves the cloud by more than the quarter-cell
    drift bound must raise the cand_ok flag (candidate lists grow stale)."""
    R, t = _rigid(rng, max_angle_deg=20)
    n, cap = 500, 512
    src = (rng.rand(n, 3) * 2).astype(np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    srcp = np.zeros((cap, 3), np.float32); srcp[:n] = src
    tgtp = np.zeros((cap, 3), np.float32); tgtp[:n] = tgt
    res = icp.registration_icp(
        jnp.asarray(srcp), jnp.asarray(tgtp), jnp.int32(n), jnp.int32(n),
        max_correspondence_distance=0.5, use_candidates=True)
    # a 20-degree rotation over a 2 m cloud moves points far beyond
    # 0.25 * 0.5 m; whether or not ICP converged, the flag must fire
    assert not bool(res.cand_ok)


def test_ransac_distance_checker_rejects_misfit_hypotheses(rng):
    """o3d CorrespondenceCheckerBasedOnDistance parity (feature-matching
    safeguard mode, deep_global_registration.py:44-46): a hypothesis whose own
    sampled correspondences misfit beyond the threshold must be pruned before
    scoring; exact-fit hypotheses must pass."""
    from deepglobalregistration_tpu.ops import ransac as rs

    R, t = _rigid(rng, max_angle_deg=30)
    sx = rng.rand(2, 4, 3).astype(np.float32)
    sy = (sx @ R.T + t).astype(np.float32)
    # hypothesis 1: one sampled pair perturbed far beyond the threshold — the
    # LSQ fit cannot bring all four residuals under it
    sy_bad = sy.copy()
    sy_bad[1, 2] += np.float32([0.5, 0.0, 0.0])
    Rs = np.stack([R, R]).astype(np.float32)
    ts = np.stack([t, t]).astype(np.float32)
    ok = np.asarray(rs._checker_distance_ok(
        jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(sx),
        jnp.asarray(sy_bad), checker_distance=0.05))
    assert bool(ok[0]) and not bool(ok[1])

    # end-to-end: the checker-enabled feature-matching mode still recovers
    # the pose on matchable features
    n, cap = 400, 512
    src = (rng.rand(n, 3) * 2).astype(np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    feats = rng.randn(n, 16).astype(np.float32)
    pad = lambda a: np.concatenate(
        [a, np.zeros((cap - n,) + a.shape[1:], np.float32)])
    res = jax.jit(lambda k, x, y, f0, f1: rs.ransac_feature_matching(
        k, x, y, f0, f1, jnp.int32(n), jnp.int32(n),
        distance_threshold=0.05, num_hypotheses=512))(
        jax.random.PRNGKey(0), jnp.asarray(pad(src)), jnp.asarray(pad(tgt)),
        jnp.asarray(pad(feats)), jnp.asarray(pad(feats)))
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)


def test_icp_checked_falls_back_to_full_scan(rng):
    """registration_icp_checked must rerun the full-scan ICP on device when
    the candidate lists go stale (VERDICT r3: cand_ok was computed but every
    pipeline call site discarded it). A coarse init — the safeguard-RANSAC
    context, where the init can be decimeters off — drifts past the
    quarter-cell bound; the checked result must equal the full-scan answer,
    not the truncated-neighborhood one."""
    R, t = _rigid(rng, max_angle_deg=20)
    n, cap = 500, 512
    src = (rng.rand(n, 3) * 2).astype(np.float32)
    tgt = (src @ R.T + t).astype(np.float32)
    srcp = np.zeros((cap, 3), np.float32); srcp[:n] = src
    tgtp = np.zeros((cap, 3), np.float32); tgtp[:n] = tgt

    args = (jnp.asarray(srcp), jnp.asarray(tgtp), jnp.int32(n), jnp.int32(n))
    checked = jax.jit(lambda s, g, ns, ng: icp.registration_icp_checked(
        s, g, ns, ng, max_correspondence_distance=0.5))(*args)
    assert not bool(checked.cand_ok)  # reports that the fallback fired
    full = icp.registration_icp(*args, max_correspondence_distance=0.5,
                                use_candidates=False)
    np.testing.assert_array_equal(np.asarray(checked.T), np.asarray(full.T))
    # and the full-scan answer actually solves the pair
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t
    np.testing.assert_allclose(np.asarray(checked.T), T_gt, atol=5e-3)
