"""End-to-end register() tests with randomly-initialized nets.

Without pretrained weights, correctness is tested through structure: FCGF
features are translation-equivariant at stride-8 granularity, so a cloud and
its 8-voxel-translated copy produce identical features -> exact 1-NN
correspondences -> the weighted-Procrustes + refinement + ICP stack must
recover the translation regardless of the (random) inlier-net weights.
"""

import numpy as np
import pytest

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration


@pytest.fixture(scope="module")
def dgr():
    cfg = default_config(
        feat_model="ResUNetBN2F", feat_model_n_out=8, feat_conv1_kernel_size=3,
        inlier_model="ResUNetBN2FX", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        point_buckets="512,1024", ransac_hypotheses=512, level_shrink=1)
    return DeepGlobalRegistration(cfg)


def _cloud(rng, n=400):
    return (rng.rand(n, 3) * 1.2).astype(np.float32)


def test_register_identity(rng, dgr):
    xyz = _cloud(rng)
    T = dgr.register(xyz, xyz.copy())
    np.testing.assert_allclose(T, np.eye(4), atol=5e-3)


def test_register_recovers_grid_aligned_translation(rng, dgr):
    xyz = _cloud(rng)
    t = np.array([8, -8, 16], np.float32) * dgr.voxel_size  # stride-8 aligned
    xyz1 = xyz + t
    T = dgr.register(xyz, xyz1)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=5e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.02)


def test_register_different_sizes_and_shuffle(rng, dgr):
    xyz = _cloud(rng, 420)
    t = np.array([-16, 8, 8], np.float32) * dgr.voxel_size
    xyz1 = (xyz + t)[rng.permutation(420)][:390]  # drop some points + shuffle
    T = dgr.register(xyz, xyz1)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.03)


def test_register_safeguard_path_runs(rng, dgr):
    # Random unrelated clouds: inlier weights may or may not pass the gate, but
    # register() must return a valid rigid transform either way.
    xyz0 = _cloud(rng)
    xyz1 = _cloud(rng) + 5.0
    T = dgr.register(xyz0, xyz1)
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert abs(np.linalg.det(R) - 1) < 1e-4


def test_register_with_dense_extent(rng):
    # the dense-index kernel-map fast path must not change results
    cfg = default_config(
        feat_model="ResUNetBN2F", feat_model_n_out=8, feat_conv1_kernel_size=3,
        inlier_model="ResUNetBN2FX", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        point_buckets="512,1024", ransac_hypotheses=512, level_shrink=1,
        dense_extent="64,64,64")
    dgr2 = DeepGlobalRegistration(cfg)
    xyz = _cloud(rng)
    t = np.array([8, 8, -8], np.float32) * dgr2.voxel_size
    T = dgr2.register(xyz, xyz + t)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.02)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=5e-3)


def test_register_batch_matches_register(rng, dgr):
    xyz = _cloud(rng, 380)
    ts = [np.array([8, -8, 8], np.float32) * dgr.voxel_size,
          np.array([-8, 16, -8], np.float32) * dgr.voxel_size]
    pairs1 = [xyz + t for t in ts]
    Ts = dgr.register_batch([xyz, xyz], pairs1, force_vmapped=True)
    assert Ts.shape == (2, 4, 4)
    # Default (non-forced) single-chip path must agree: it routes through the
    # pipelined stream, whose per-pair program IS register()'s fused program.
    Ts_stream = dgr.register_batch([xyz, xyz], pairs1)
    assert Ts_stream.shape == (2, 4, 4)
    for T, t in zip(Ts_stream, ts):
        np.testing.assert_allclose(T[:3, 3], t, atol=0.03)
    for T, t in zip(Ts, ts):
        np.testing.assert_allclose(T[:3, 3], t, atol=0.03)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-2)


def test_register_batch_no_retrace(rng, dgr):
    """Second same-shape call must hit the jit cache (regression: the vmapped
    registration used to be re-jitted — and params re-baked — per call)."""
    xyz = _cloud(rng, 380)
    t = np.array([8, 8, -8], np.float32) * dgr.voxel_size
    dgr.register_batch([xyz], [xyz + t], force_vmapped=True)
    n_traces = dgr._register_batch_jit._cache_size()
    dgr.register_batch([xyz], [xyz + t], force_vmapped=True)
    assert dgr._register_batch_jit._cache_size() == n_traces


@pytest.mark.slow
def test_register_batch_sharded(rng, dgr):
    from deepglobalregistration_tpu.parallel.data_parallel import make_mesh

    mesh = make_mesh(4)
    xyz = _cloud(rng, 300)
    t = np.array([8, 8, 8], np.float32) * dgr.voxel_size
    # 3 pairs over a 4-device mesh exercises batch padding
    Ts = dgr.register_batch([xyz] * 3, [xyz + t] * 3, mesh=mesh)
    assert Ts.shape == (3, 4, 4)
    for T in Ts:
        np.testing.assert_allclose(T[:3, 3], t, atol=0.03)


@pytest.mark.slow
def test_knn_search_method_cpu_matches_gpu(rng):
    """'cpu' (host cKDTree) and 'gpu' (device tiled scan) matching must agree
    end-to-end (reference find_knn_batch dispatch, core/knn.py:77-103)."""
    from deepglobalregistration_tpu.config import default_config as dc

    kw = dict(
        feat_model="ResUNetBN2F", feat_model_n_out=8, feat_conv1_kernel_size=3,
        inlier_model="ResUNetBN2FX", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        point_buckets="512,1024", ransac_hypotheses=512, level_shrink=1)
    dgr_gpu = DeepGlobalRegistration(dc(knn_search_method="gpu", **kw))
    dgr_cpu = DeepGlobalRegistration(dc(knn_search_method="cpu", **kw))
    xyz = _cloud(rng)
    t = np.array([8, -8, 8], np.float32) * 0.05
    T_gpu = dgr_gpu.register(xyz, xyz + t)
    T_cpu = dgr_cpu.register(xyz, xyz + t)
    np.testing.assert_allclose(T_cpu, T_gpu, atol=1e-4)
    np.testing.assert_allclose(T_cpu[:3, 3], t, atol=0.02)


def test_register_bf16_compute(rng):
    """bf16 conv compute must still recover a grid-aligned translation (the
    MXU-native path; matching/solvers stay f32)."""
    cfg = default_config(
        feat_model="ResUNetBN2F", feat_model_n_out=8, feat_conv1_kernel_size=3,
        inlier_model="ResUNetBN2FX", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        point_buckets="512,1024", ransac_hypotheses=512, level_shrink=1,
        bf16=True)
    dgr_bf16 = DeepGlobalRegistration(cfg)
    xyz = _cloud(rng)
    t = np.array([8, -8, 8], np.float32) * dgr_bf16.voxel_size
    T = dgr_bf16.register(xyz, xyz + t)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=5e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.02)


def test_staged_public_api_composes(rng, dgr):
    """The reference's staged methods (preprocess -> fcgf_feature_extraction
    -> fcgf_feature_matching -> inlier_feature_generation -> inlier_prediction
    -> safeguard_registration; deep_global_registration.py:134-236) must work
    standalone and compose into a sane registration."""
    xyz0 = _cloud(rng, 350)
    t = np.array([8, 8, 8], np.float32) * dgr.voxel_size
    xyz1 = xyz0 + t

    x0, c0, f0 = dgr.preprocess(xyz0)
    x1, c1, f1 = dgr.preprocess(xyz1)
    assert x0.shape == (len(c0), 3) and f0.shape == (len(c0), 1)

    feats0 = dgr.fcgf_feature_extraction(f0, c0)
    feats1 = dgr.fcgf_feature_extraction(f1, c1)
    assert feats0.shape == (len(c0), 8)

    i0, i1 = dgr.fcgf_feature_matching(feats0, feats1)
    # translation-equivariant features: matches recover the shifted voxels
    np.testing.assert_array_equal(c1[i1], c0 + np.array([8, 8, 8], np.int32))

    ifeat = dgr.inlier_feature_generation(x0, x1, c0, c1, feats0, feats1,
                                          i0, i1)
    assert ifeat.shape == (len(i0), 1)
    coords6 = np.concatenate([c0[i0], c1[i1]], axis=1)
    logits = dgr.inlier_prediction(ifeat, coords6)
    assert logits.shape == (len(i0), 1) and np.isfinite(logits).all()

    # the reference passes the VOXELIZED clouds here (register(), :302-315)
    T = dgr.safeguard_registration(x0, x1, i0, i1, feats0, feats1,
                                   distance_threshold=2 * dgr.voxel_size,
                                   num_iterations=2048)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.02)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=5e-3)


def test_register_many_matches_register(rng, dgr):
    xyz = (rng.rand(600, 3) * 2).astype(np.float32)
    t = np.array([0.2, -0.1, 0.15], np.float32)
    Ts = dgr.register_many([xyz, xyz], [xyz + t, xyz + t])
    T1 = dgr.register(xyz, xyz + t)
    assert Ts.shape == (2, 4, 4)
    np.testing.assert_allclose(Ts[0], T1, atol=1e-4)
    np.testing.assert_allclose(Ts[1], T1, atol=1e-4)


def test_split_register_matches_fused(rng):
    """--split_register routes register() through the per-stage jits (the
    cold-start knob: each stage compiles separately and far faster than the
    fused program). Same math, so the recovered pose must match the fused
    path; register_many must fall back to the sequential loop."""
    from deepglobalregistration_tpu.config import default_config as dc

    kw = dict(
        feat_model="ResUNetBN2F", feat_model_n_out=8, feat_conv1_kernel_size=3,
        inlier_model="ResUNetBN2FX", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        point_buckets="512,1024", ransac_hypotheses=512, level_shrink=1)
    dgr_fused = DeepGlobalRegistration(dc(**kw))
    dgr_split = DeepGlobalRegistration(dc(split_register=True, **kw))
    assert dgr_split.split_register

    xyz = _cloud(rng)
    t = np.array([8, -8, 16], np.float32) * dgr_split.voxel_size
    T_split = dgr_split.register(xyz, xyz + t)
    T_fused = dgr_fused.register(xyz, xyz + t)
    np.testing.assert_allclose(T_split, T_fused, atol=1e-4)
    np.testing.assert_allclose(T_split[:3, 3], t, atol=0.02)

    Ts = dgr_split.register_many([xyz], [xyz + t])
    np.testing.assert_allclose(Ts[0], T_split, atol=1e-4)


def test_icp_candidates_forced_on_matches_default(rng):
    """--icp_candidates on|off|auto: at small caps auto picks the full scan
    (tools/icp_probe.py round 4: the candidate build costs 6x one scan);
    forcing candidates on must still produce the same pose on a
    near-converged pair (candidates stay within the quarter-cell bound, and
    the checked wrapper reruns the full scan when they don't)."""
    from deepglobalregistration_tpu.config import default_config as dc

    kw = dict(
        feat_model="ResUNetBN2F", feat_model_n_out=8, feat_conv1_kernel_size=3,
        inlier_model="ResUNetBN2FX", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        point_buckets="512,1024", ransac_hypotheses=512, level_shrink=1)
    dgr_scan = DeepGlobalRegistration(dc(**kw))          # auto -> full scan
    dgr_cand = DeepGlobalRegistration(dc(icp_candidates="on", **kw))

    xyz = _cloud(rng)
    t = np.array([8, -8, 8], np.float32) * dgr_scan.voxel_size
    T_scan = dgr_scan.register(xyz, xyz + t)
    T_cand = dgr_cand.register(xyz, xyz + t)
    np.testing.assert_allclose(T_cand, T_scan, atol=1e-3)
    np.testing.assert_allclose(T_scan[:3, 3], t, atol=0.02)


def test_feature_only_checkpoint_loads(rng, tmp_path):
    """A checkpoint holding just the FCGF tree (state_dict_inlier=None, e.g.
    a converted FCGF .pth or tools/export_bench_weights.py output) must load:
    trained features drive matching, the 6D inlier net random-inits
    (core/pipeline.py feature-only fallback)."""
    import jax

    from deepglobalregistration_tpu.models import load_model
    from deepglobalregistration_tpu.utils import checkpoint as ckpt_utils

    spec = load_model("ResUNetBN2F")
    cfg = spec.make_config(1, 8, conv1_kernel_size=3, normalize_feature=True,
                           D=3)
    params, state = spec.init(jax.random.PRNGKey(5), cfg)
    p = tmp_path / "fcgf_only.pkl"
    ckpt_utils.save_checkpoint(
        p, epoch=0, params=params, state=state, dtype="bf16", compress=True,
        config={"voxel_size": 0.05, "inlier_feature_type": "ones",
                "feat_model": "ResUNetBN2F", "feat_model_n_out": 8,
                "feat_conv1_kernel_size": 3, "inlier_model": "ResUNetBN2FX",
                "inlier_conv1_kernel_size": 3, "bn_momentum": 0.05,
                "normalize_feature": True})

    dgr = DeepGlobalRegistration(default_config(
        weights=str(p), point_buckets="512,1024", ransac_hypotheses=512,
        level_shrink=1))
    xyz = _cloud(rng)
    t = np.array([8, -8, 16], np.float32) * dgr.voxel_size
    T = dgr.register(xyz, xyz + t)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.02)
