"""KITTI odometry LiDAR pair datasets (dataloader/kitti_loader.py:17-286).

GT pose = velo2cam-chained odometry refined by ICP and cached to disk
(kitti_loader.py:138-164); the ICP refinement here runs through our jitted
point-to-point ICP (ops/icp.py) instead of Open3D. Pairs with fewer than 1000
GT matches raise (kitti_loader.py:197-198). KITTINMPairDataset emits pairs at
least MIN_DIST=10 m apart following the 3DFeatNet protocol.
"""

from __future__ import annotations

import glob
import logging
import os
import random

import numpy as np

from .. import native
from .base import SPLIT_DIR, PairDataset
from .transforms import sample_random_trans

_kitti_cache: dict = {}
_kitti_icp_cache: dict = {}


def _icp_refine(xyz0: np.ndarray, xyz1: np.ndarray, max_dist: float = 0.2,
                max_iteration: int = 200) -> np.ndarray:
    """Jitted ICP on padded buffers (device), numpy in/out."""
    import jax.numpy as jnp

    from ..ops import icp as icp_ops

    cap = 1 << int(np.ceil(np.log2(max(len(xyz0), len(xyz1), 2))))
    p0 = np.zeros((cap, 3), np.float32)
    p1 = np.zeros((cap, 3), np.float32)
    p0[: len(xyz0)] = xyz0
    p1[: len(xyz1)] = xyz1
    # Full-scan neighbor search: GT refinement starts from raw odometry poses
    # whose error can exceed the candidate-list drift bound (ops/icp.py); this
    # path is offline data prep, accuracy-critical, and cached.
    res = icp_ops.registration_icp(jnp.asarray(p0), jnp.asarray(p1),
                                   jnp.int32(len(xyz0)), jnp.int32(len(xyz1)),
                                   max_correspondence_distance=max_dist,
                                   max_iteration=max_iteration,
                                   use_candidates=False)
    return np.asarray(res.T, dtype=np.float64)


class KITTIPairDataset(PairDataset):
    DATA_FILES = {
        "train": str(SPLIT_DIR / "train_kitti.txt"),
        "val": str(SPLIT_DIR / "val_kitti.txt"),
        "test": str(SPLIT_DIR / "test_kitti.txt"),
    }
    TEST_RANDOM_ROTATION = False
    MIN_MATCHES = 1000

    def __init__(self, phase, transform=None, random_rotation=True,
                 random_scale=True, manual_seed=False, config=None):
        self.root = root = os.path.join(config.kitti_dir, "dataset")
        self.icp_path = config.icp_cache_path
        os.makedirs(self.icp_path, exist_ok=True)
        random_rotation = self.TEST_RANDOM_ROTATION
        super().__init__(phase, transform, random_rotation, random_scale,
                         manual_seed, config)
        logging.info("Loading the subset %s from %s", phase, root)
        self.max_time_diff = config.kitti_max_time_diff

        subset_names = open(self.DATA_FILES[phase]).read().split()
        for dirname in subset_names:
            drive_id = int(dirname)
            inames = self.get_all_scan_ids(drive_id)
            for start_time in inames:
                for time_diff in range(2, self.max_time_diff):
                    pair_time = time_diff + start_time
                    if pair_time in inames:
                        self.files.append((drive_id, start_time, pair_time))

    def get_all_scan_ids(self, drive_id):
        fnames = glob.glob(self.root + "/sequences/%02d/velodyne/*.bin" % drive_id)
        assert len(fnames) > 0, f"no velodyne scans for drive {drive_id} under {self.root}"
        return [int(os.path.split(f)[-1][:-4]) for f in fnames]

    @property
    def velo2cam(self):
        """KITTI raw velodyne->cam0 extrinsics, transposed for row-vector use
        (kitti_loader.py:66-78)."""
        if not hasattr(self, "_velo2cam"):
            R = np.array([7.533745e-03, -9.999714e-01, -6.166020e-04, 1.480249e-02,
                          7.280733e-04, -9.998902e-01, 9.998621e-01, 7.523790e-03,
                          1.480755e-02]).reshape(3, 3)
            T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01]).reshape(3, 1)
            self._velo2cam = np.vstack((np.hstack([R, T]), [0, 0, 0, 1])).T
        return self._velo2cam

    def get_video_odometry(self, drive, indices=None, return_all=False):
        data_path = self.root + "/poses/%02d.txt" % drive
        if data_path not in _kitti_cache:
            _kitti_cache[data_path] = np.genfromtxt(data_path)
        return _kitti_cache[data_path] if return_all else _kitti_cache[data_path][indices]

    @staticmethod
    def odometry_to_positions(odometry):
        return np.vstack((odometry.reshape(3, 4), [0, 0, 0, 1]))

    def _get_velodyne_fn(self, drive, t):
        return self.root + "/sequences/%02d/velodyne/%06d.bin" % (drive, t)

    def _gt_transform(self, drive, t0, t1, xyz0, xyz1, positions):
        """Odometry-chained GT, ICP-refined and cached (kitti_loader.py:138-164)."""
        key = "%d_%d_%d" % (drive, t0, t1)
        filename = os.path.join(self.icp_path, key + ".npy")
        if key in _kitti_icp_cache:
            return _kitti_icp_cache[key]
        if os.path.exists(filename):
            M2 = np.load(filename)
        else:
            def coarse(xyz):
                c = np.floor(xyz / 0.05).astype(np.int32)
                _, sel = np.unique(c, axis=0, return_index=True)
                return xyz[np.sort(sel)]

            M = (self.velo2cam @ positions[0].T @ np.linalg.inv(positions[1].T)
                 @ np.linalg.inv(self.velo2cam)).T
            xyz0_t = self.apply_transform(coarse(xyz0), M)
            reg_T = _icp_refine(xyz0_t.astype(np.float32), coarse(xyz1).astype(np.float32))
            M2 = M @ reg_T
            np.save(filename, M2)
        _kitti_icp_cache[key] = M2
        return M2

    def __getitem__(self, idx):
        drive, t0, t1 = self.files[idx]
        positions = [self.odometry_to_positions(o)
                     for o in self.get_video_odometry(drive, [t0, t1])]
        xyz0 = np.fromfile(self._get_velodyne_fn(drive, t0), dtype=np.float32).reshape(-1, 4)[:, :3]
        xyz1 = np.fromfile(self._get_velodyne_fn(drive, t1), dtype=np.float32).reshape(-1, 4)[:, :3]

        M2 = self._gt_transform(drive, t0, t1, xyz0, xyz1, positions)

        if self.random_rotation:
            T0 = sample_random_trans(xyz0, self.randg, np.pi / 4)
            T1 = sample_random_trans(xyz1, self.randg, np.pi / 4)
            trans = T1 @ M2 @ np.linalg.inv(T0)
            xyz0 = self.apply_transform(xyz0, T0)
            xyz1 = self.apply_transform(xyz1, T1)
        else:
            trans = M2

        matching_search_voxel_size = self.matching_search_voxel_size
        if self.random_scale and random.random() < 0.95:
            scale = self.min_scale + (self.max_scale - self.min_scale) * random.random()
            matching_search_voxel_size *= scale
            xyz0 = scale * xyz0
            xyz1 = scale * xyz1

        p0, c0, p1, c1 = self.voxelize_pair(xyz0, xyz1)
        matches = native.radius_pairs(p0, p1, trans.astype(np.float32),
                                      matching_search_voxel_size)
        if len(matches) < self.MIN_MATCHES:
            raise ValueError(f"Insufficient matches in {drive}, {t0}, {t1}")

        f0 = np.ones((len(p0), 1), np.float32)
        f1 = np.ones((len(p1), 1), np.float32)
        if self.transform:
            c0, f0 = self.transform(c0, f0)
            c1, f1 = self.transform(c1, f1)
        extra = {"drive": drive, "t0": t0, "t1": t1}
        return p0, p1, c0, c1, f0, f1, matches, trans.astype(np.float32), extra


class KITTINMPairDataset(KITTIPairDataset):
    """Pairs >= MIN_DIST meters apart (kitti_loader.py:229-286)."""

    MIN_DIST = 10

    def __init__(self, phase, transform=None, random_rotation=True,
                 random_scale=True, manual_seed=False, config=None):
        self.root = root = os.path.join(config.kitti_dir, "dataset")
        self.icp_path = os.path.join(config.kitti_dir, config.icp_cache_path)
        os.makedirs(self.icp_path, exist_ok=True)
        random_rotation = self.TEST_RANDOM_ROTATION
        PairDataset.__init__(self, phase, transform, random_rotation, random_scale,
                             manual_seed, config)
        logging.info("Loading the subset %s from %s", phase, root)

        subset_names = open(self.DATA_FILES[phase]).read().split()
        for dirname in subset_names:
            drive_id = int(dirname)
            inames = sorted(self.get_all_scan_ids(drive_id))
            all_odo = self.get_video_odometry(drive_id, return_all=True)
            all_pos = np.array([self.odometry_to_positions(o) for o in all_odo])
            Ts = all_pos[:, :3, 3]
            pdist = np.sqrt(((Ts.reshape(1, -1, 3) - Ts.reshape(-1, 1, 3)) ** 2).sum(-1))
            more_than_10 = pdist > self.MIN_DIST
            curr_time = inames[0]
            while curr_time in inames:
                next_time = np.where(more_than_10[curr_time][curr_time:curr_time + 100])[0]
                if len(next_time) == 0:
                    curr_time += 1
                    continue
                next_time = next_time[0] + curr_time - 1
                if next_time in inames:
                    self.files.append((drive_id, curr_time, next_time))
                    curr_time = next_time + 1
        # Remove problematic sequence (kitti_loader.py:281-286)
        for item in [(8, 15, 58)]:
            if item in self.files:
                self.files.remove(item)
