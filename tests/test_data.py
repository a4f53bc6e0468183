"""Data pipeline tests over synthetic on-disk fixtures (no real datasets in CI)."""

import os

import numpy as np
import pytest

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.data import collate, factory
from deepglobalregistration_tpu.data.threedmatch import ThreeDMatchPairDataset03
from deepglobalregistration_tpu.utils import file as file_utils
from deepglobalregistration_tpu.utils import pointcloud as pc


@pytest.fixture
def threedmatch_root(tmp_path, rng):
    """Synthetic 3DMatch layout: npz fragments + overlap txt + gt.log + plys."""
    root = tmp_path / "threedmatch"
    root.mkdir()
    scene = "sun3d-home_at-home_at_scan1_2013_jan_1"
    for i in range(3):
        pts = (rng.rand(500, 3) * 2).astype(np.float32)
        np.savez(root / f"{scene}@seq-01_{i:03d}.npz", pcd=pts)
    with open(root / f"{scene}@seq-01-0.30.txt", "w") as f:
        f.write(f"{scene}@seq-01_000.npz {scene}@seq-01_001.npz 0.7\n")
        f.write(f"{scene}@seq-01_001.npz {scene}@seq-01_002.npz 0.6\n")
    # train split expects this scene name; write a custom split file
    split = tmp_path / "split.txt"
    split.write_text(scene + "\n")
    return root, split, scene


def test_threedmatch_pair_dataset(threedmatch_root, rng):
    root, split, scene = threedmatch_root
    config = default_config(threed_match_dir=str(root), voxel_size=0.05)
    ds = ThreeDMatchPairDataset03.__new__(ThreeDMatchPairDataset03)
    ThreeDMatchPairDataset03.DATA_FILES = dict(ThreeDMatchPairDataset03.DATA_FILES,
                                               train=str(split))
    ds.__init__("train", config=config)
    assert len(ds) == 2
    p0, p1, c0, c1, f0, f1, matches, trans, extra = ds[0]
    assert p0.shape[1] == 3 and c0.dtype == np.int32
    assert f0.shape == (len(p0), 1)
    assert trans.shape == (4, 4)
    assert matches.ndim == 2 and matches.shape[1] == 2
    # GT matches are actually correct under the transform
    moved = p0 @ trans[:3, :3].T + trans[:3, 3]
    d = np.linalg.norm(moved[matches[:200, 0]] - p1[matches[:200, 1]], axis=1)
    assert (d < 0.05 * 1.5 * 1.25).all()


def test_collate_pair_batch(threedmatch_root):
    root, split, scene = threedmatch_root
    config = default_config(threed_match_dir=str(root), voxel_size=0.05,
                            dataset="ThreeDMatchPairDataset03")
    ThreeDMatchPairDataset03.DATA_FILES = dict(ThreeDMatchPairDataset03.DATA_FILES,
                                               train=str(split))
    loader = factory.make_data_loader(config, "train", batch_size=2)
    batch_dict = next(iter(loader))
    pb = batch_dict["pair_batch"]
    assert pb.xyz0.shape[0] == 2 and pb.xyz0.shape[2] == 3
    assert pb.xyz0.shape == pb.xyz1.shape
    for i in range(2):
        assert pb.num0[i] <= pb.xyz0.shape[1]
        np.testing.assert_array_equal(
            np.floor(pb.xyz0[i, : pb.num0[i]] / 0.05).astype(np.int32),
            pb.coords0[i, : pb.num0[i]])
    assert batch_dict["T_gt"].shape == (2, 4, 4)
    assert len(batch_dict["len_batch"]) == 2


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.rand(100, 3).astype(np.float32)
    path = tmp_path / "c.ply"
    pc.write_point_cloud(path, pts)
    back = pc.read_point_cloud(path)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_read_trajectory(tmp_path):
    poses = [np.diag([1.0, 1, 1, 1]), np.arange(16, dtype=float).reshape(4, 4)]
    with open(tmp_path / "gt.log", "w") as f:
        for k, p in enumerate(poses):
            f.write(f"{k} {k+1} 3\n")
            for row in p:
                f.write(" ".join(map(str, row)) + "\n")
    traj = file_utils.read_trajectory(tmp_path / "gt.log")
    assert len(traj) == 2
    assert traj[0].meta == [0, 1, 3]
    np.testing.assert_allclose(traj[1].pose, poses[1])


def test_matching_indices_oracle(rng):
    src = rng.rand(50, 3).astype(np.float32)
    tgt = np.concatenate([src + 0.001, rng.rand(30, 3).astype(np.float32) + 5], 0)
    pairs = pc.get_matching_indices(src, tgt, np.eye(4), 0.01)
    assert len(pairs) >= 50
    assert (pairs[:, 1] < 50).all()  # only the near-copies match


def test_overlap_ratio(rng):
    a = rng.rand(200, 3).astype(np.float32)
    assert pc.compute_overlap_ratio(a, a.copy(), np.eye(4), 0.05) == 1.0
    b = a + 100.0
    assert pc.compute_overlap_ratio(a, b, np.eye(4), 0.05) == 0.0


def _match_residuals(p0, p1, matches, trans):
    moved = p0[matches[:, 0]] @ trans[:3, :3].T + trans[:3, 3]
    return np.linalg.norm(moved - p1[matches[:, 1]], axis=1)


def test_synthetic_pair_dataset():
    """Procedural indoor pairs: deterministic per (phase, idx), GT matches
    within the search radius, disjoint phase seeds."""
    from deepglobalregistration_tpu.data.synthetic import SyntheticPairDataset

    cfg = default_config(dataset="SyntheticPairDataset", synthetic_points=3000,
                         voxel_size=0.05)
    ds = SyntheticPairDataset("train", config=cfg)
    p0, p1, c0, c1, f0, f1, matches, trans, _ = ds[1]
    assert len(p0) > 500 and len(matches) > 100
    radius = cfg.voxel_size * cfg.positive_pair_search_voxel_size_multiplier
    # random_scale can enlarge the search radius by up to max_scale
    assert _match_residuals(p0, p1, matches, trans).max() <= \
        radius * cfg.max_scale + 1e-5
    p0b, *_ = ds[1]
    np.testing.assert_array_equal(p0, p0b)  # pure function of (phase, idx)
    val = SyntheticPairDataset("val", config=cfg)
    assert not np.array_equal(val[1][0][:100], p0[:100])  # disjoint seeds


def test_synthetic_lidar_pair_dataset():
    """Outdoor LiDAR-scale pairs: KITTI-NM >= 10 m vantage baseline is the GT
    pose itself on the un-augmented test phase; matches within radius."""
    from deepglobalregistration_tpu.data.synthetic import (
        SyntheticLidarPairDataset)

    cfg = default_config(dataset="SyntheticLidarPairDataset",
                         synthetic_points=6000, voxel_size=0.3)
    ds = SyntheticLidarPairDataset("test", random_rotation=False,
                                   random_scale=False, config=cfg)
    p0, p1, c0, c1, f0, f1, matches, trans, _ = ds[0]
    assert len(p0) > 1000 and len(matches) > 200
    assert np.linalg.norm(trans[:3, 3]) >= 9.0  # the >=10 m protocol (z shifts it slightly)
    R = trans[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    radius = cfg.voxel_size * cfg.positive_pair_search_voxel_size_multiplier
    assert _match_residuals(p0, p1, matches, trans).max() <= radius + 1e-5
    # augmented train phase keeps GT-match validity
    dtr = SyntheticLidarPairDataset("train", config=cfg)
    p0, p1, c0, c1, f0, f1, matches, trans, _ = dtr[3]
    assert _match_residuals(p0, p1, matches, trans).max() <= \
        radius * cfg.max_scale + 1e-5


def test_synthetic_trajectory_dataset_convention():
    """evaluate() expects items (scene, xyz0, xyz1, trans) where inv(trans)
    is register(xyz0, xyz1)'s GT: mapping xyz0 into xyz1's frame with
    inv(trans) must land on overlapping geometry."""
    from deepglobalregistration_tpu.data.synthetic import (
        SyntheticTrajectoryDataset)
    from scipy.spatial import cKDTree

    ds = SyntheticTrajectoryDataset(n_points=4000, n_scenes=1,
                                    pairs_per_scene=2)
    scene, xyz0, xyz1, trans = ds[0]
    T = np.linalg.inv(trans)
    moved = xyz0 @ T[:3, :3].T + T[:3, 3]
    d, _ = cKDTree(xyz1).query(moved, k=1)
    # overlap >= 70%: most moved points have a near neighbor in xyz1
    assert (d < 0.05).mean() > 0.5
