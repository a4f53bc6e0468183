"""TSDF integration tool: fuse synthetic depth of a known plane, recover it."""

import numpy as np

from deepglobalregistration_tpu.utils.integration import TSDFVolume


def test_tsdf_recovers_flat_wall():
    # Camera at origin looking down +z at a wall at z = 1.0 m.
    h, w = 48, 64
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
    depth = np.full((h, w), 1.0, np.float32)

    vol = TSDFVolume(origin=np.array([-1.0, -1.0, 0.5], np.float32),
                     voxel_size=0.02, dims=(100, 100, 50), sdf_trunc=0.06)
    for _ in range(3):
        vol.integrate(depth, K, np.eye(4))
    pts = vol.extract_point_cloud()
    assert len(pts) > 100
    # all surface points near z = 1.0
    assert np.abs(pts[:, 2] - 1.0).max() < 0.05


def test_tsdf_empty_depth_yields_no_surface():
    vol = TSDFVolume(origin=np.zeros(3, np.float32), voxel_size=0.05,
                     dims=(20, 20, 20), sdf_trunc=0.1)
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    vol.integrate(np.zeros((48, 64), np.float32), K, np.eye(4))
    assert len(vol.extract_point_cloud()) == 0
