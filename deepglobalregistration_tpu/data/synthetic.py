"""Procedural indoor-scan pair dataset with exact ground truth.

This image is zero-egress (no 3DMatch/KITTI downloads), so the end-to-end
train -> validate -> benchmark chain (reference flow core/trainer.py:120-155 +
scripts/test_3dmatch.py:87-156) runs on procedurally generated "room scans":
plane-dominated clouds with clutter, two partially overlapping crops, additive
sensor noise, and the reference's augmentation recipe (random SO(3) per cloud,
GT trans = T1 @ inv(T0), radius-matched GT correspondences — mirrors
dataloader/threedmatch_loader.py:48-124).

Every item is a pure function of (phase, index): train/val/test draw from
disjoint seed ranges, so the suite is reproducible and leakage-free.
"""

from __future__ import annotations

import numpy as np

from .. import native
from .base import PairDataset
from .transforms import sample_random_trans


def _surface_relief(rng: np.random.RandomState, u: np.ndarray,
                    v: np.ndarray) -> np.ndarray:
    """Smooth pseudo-random height field h(u, v): a mixture of sinusoids with
    wavelengths 0.3-1.2 m and amplitudes a few cm. Plane points displaced by
    this are locally distinctive at FCGF's receptive scale (~0.5 m at 5 cm
    voxels) — perfectly flat planes are feature-ambiguous everywhere, which
    capped learned 1-NN hit ratios near zero (round-3 e2e finding)."""
    h = np.zeros_like(u)
    for _ in range(6):
        freq = 2 * np.pi / (0.3 + 0.9 * rng.rand())  # wavelength 0.3-1.2 m
        direc = rng.randn(2)
        direc /= np.linalg.norm(direc)
        phase = 2 * np.pi * rng.rand()
        amp = 0.01 + 0.04 * rng.rand()
        h += amp * np.sin(freq * (u * direc[0] + v * direc[1]) + phase)
    return h


def make_room(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Surface-heavy synthetic room: axis-aligned relief-textured planes
    (walls/floor), clutter boxes/spheres/cylinders, and mild Gaussian sensor
    noise. Extents ~2.5-4 m."""
    ext = 2.5 + 1.5 * rng.rand(3)
    pts = []
    n_planes = 4 + rng.randint(3)  # 4-6 planes
    n_clutter = 3 + rng.randint(3)  # 3-5 objects
    per_plane = n // (n_planes + n_clutter // 2)
    for _ in range(n_planes):
        axis = rng.randint(3)
        u = rng.rand(per_plane, 2)
        p = np.zeros((per_plane, 3), np.float32)
        others = [i for i in range(3) if i != axis]
        p[:, others[0]] = u[:, 0] * ext[others[0]]
        p[:, others[1]] = u[:, 1] * ext[others[1]]
        p[:, axis] = rng.rand() * ext[axis] + _surface_relief(
            rng, p[:, others[0]], p[:, others[1]])
        pts.append(p)
    for _ in range(n_clutter):
        c = rng.rand(3) * ext * 0.8
        m = per_plane // 2
        kind = rng.randint(3)
        if kind == 0:  # box shell
            s = 0.15 + 0.45 * rng.rand(3)
            face = rng.randint(3, size=m)
            u = rng.rand(m, 3)
            u[np.arange(m), face] = (rng.rand(m) < 0.5).astype(np.float64)
            q = c + (u - 0.5) * s
        elif kind == 1:  # sphere shell
            r = 0.1 + 0.25 * rng.rand()
            d = rng.randn(m, 3)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            q = c + r * d
        else:  # open cylinder shell
            r = 0.08 + 0.2 * rng.rand()
            h = 0.2 + 0.6 * rng.rand()
            ax = rng.randint(3)
            th = 2 * np.pi * rng.rand(m)
            q = np.empty((m, 3))
            others = [i for i in range(3) if i != ax]
            q[:, others[0]] = r * np.cos(th)
            q[:, others[1]] = r * np.sin(th)
            q[:, ax] = h * (rng.rand(m) - 0.5)
            q += c
        pts.append(q.astype(np.float32))
    cloud = np.concatenate(pts).astype(np.float32)
    cloud += (0.004 * rng.randn(*cloud.shape)).astype(np.float32)
    return cloud


def crop_view(rng: np.random.RandomState, cloud: np.ndarray,
              keep: float) -> np.ndarray:
    """Half-space crop keeping ~`keep` of the points (a partial view)."""
    d = rng.randn(3)
    d /= np.linalg.norm(d)
    proj = cloud @ d
    thresh = np.quantile(proj, 1.0 - keep)
    return cloud[proj >= thresh]


class SyntheticTrajectoryDataset:
    """Held-out raw-pair test set in the trajectory-dataset convention
    (threedmatch.py ThreeDMatchTrajectoryDataset / reference
    threedmatch_loader.py:144-196): items are ``(scene, xyz0, xyz1, trans)``
    where ``inv(trans)`` is the pose register(xyz0, xyz1) should produce —
    the convention scripts/test_3dmatch.py's evaluate() expects. Seeds are
    disjoint from SyntheticPairDataset's train/val ranges; pairs group into
    a few pseudo-scenes so the per-scene recall table exercises."""

    SEED_BASE = 3_000_000
    N_SCENES = 4
    PAIRS_PER_SCENE = 8

    def __init__(self, n_points: int = 20000, n_scenes: int | None = None,
                 pairs_per_scene: int | None = None):
        self.n_points = n_points
        n_scenes = n_scenes or self.N_SCENES
        pairs = pairs_per_scene or self.PAIRS_PER_SCENE
        self.files = [(f"synthetic-scene-{s}", s * pairs + p)
                      for s in range(n_scenes) for p in range(pairs)]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        sname, seed = self.files[idx]
        rng = np.random.RandomState(self.SEED_BASE + seed)
        room = make_room(rng, self.n_points)
        keep = 0.7 + 0.2 * rng.rand()
        xyz0 = crop_view(rng, room, keep)
        xyz1 = crop_view(rng, room, keep)
        T0 = sample_random_trans(xyz0, rng, 360.0)
        T1 = sample_random_trans(xyz1, rng, 360.0)
        T_reg = T1 @ np.linalg.inv(T0)  # register(xyz0, xyz1) ground truth
        xyz0 = (xyz0 @ T0[:3, :3].T + T0[:3, 3]).astype(np.float32)
        xyz1 = (xyz1 @ T1[:3, :3].T + T1[:3, 3]).astype(np.float32)
        return sname, xyz0, xyz1, np.linalg.inv(T_reg)


class SyntheticPairDataset(PairDataset):
    """Procedural pairs; overlap ~60-85%. No on-disk data required."""

    SEED_BASE = {"train": 0, "val": 1_000_000, "test": 2_000_000}
    SIZE = {"train": 4000, "val": 32, "test": 32}
    DATA_FILES = {"train": None, "val": None, "test": None}  # registry compat

    def __init__(self, phase, transform=None, random_rotation=True,
                 random_scale=True, manual_seed=False, config=None):
        super().__init__(phase, transform, random_rotation, random_scale,
                         manual_seed, config)
        self.n_points = int(getattr(config, "synthetic_points", 20000) or 20000)
        self.files = list(range(self.SIZE[phase]))
        self.seed_base = self.SEED_BASE[phase]

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed_base + int(idx))
        room = make_room(rng, self.n_points)
        keep = 0.7 + 0.2 * rng.rand()
        xyz0 = crop_view(rng, room, keep)
        xyz1 = crop_view(rng, room, keep)

        matching_search_voxel_size = self.matching_search_voxel_size
        if self.random_scale and rng.rand() < 0.95:
            scale = self.min_scale + (self.max_scale - self.min_scale) * rng.rand()
            matching_search_voxel_size *= scale
            xyz0 = scale * xyz0
            xyz1 = scale * xyz1

        if self.random_rotation:
            T0 = sample_random_trans(xyz0, rng, self.rotation_range)
            T1 = sample_random_trans(xyz1, rng, self.rotation_range)
            trans = T1 @ np.linalg.inv(T0)
            xyz0 = self.apply_transform(xyz0, T0)
            xyz1 = self.apply_transform(xyz1, T1)
        else:
            trans = np.identity(4)

        p0, c0, p1, c1 = self.voxelize_pair(xyz0, xyz1)
        matches = native.radius_pairs(p0, p1, trans.astype(np.float32),
                                      matching_search_voxel_size)
        f0 = np.ones((len(p0), 1), np.float32)
        f1 = np.ones((len(p1), 1), np.float32)
        if self.transform:
            c0, f0 = self.transform(c0, f0)
            c1, f1 = self.transform(c1, f1)
        extra = {"idx": idx}
        return p0, p1, c0, c1, f0, f1, matches, trans.astype(np.float32), extra
