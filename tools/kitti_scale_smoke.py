"""KITTI-scale robustness smoke for register() on real hardware.

Validates that the pipeline runs end-to-end at the OUTDOOR configuration —
120k-point LiDAR-like cloud, 0.3 m voxel (~20k voxels -> the 32768 bucket),
conv1 kernel 5, asymmetric --dense_extent box — and reports steady-state
latency. Registration ACCURACY is informational only: with untrained
(random) weights a ring-structured scan is ambiguous beyond the nets'
receptive field, so the pose check requires the released KITTI checkpoint
(reference README.md:67; load with --weights once available).

Usage: python tools/kitti_scale_smoke.py   (runs on the default backend)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration


def lidar_like_pair(seed=0, n=120000):
    """Surface-structured scan (~20k voxels at 0.3 m) + rigid transform."""
    rng = np.random.RandomState(seed)
    n_seed = 15000
    ang = rng.rand(n_seed) * 2 * np.pi
    r = np.clip(np.abs(rng.randn(n_seed)) * 18 + 2, 0, 45)
    z = rng.rand(n_seed) * 3 - 1 + 0.02 * r
    seeds = np.stack([r * np.cos(ang), r * np.sin(ang), z], 1).astype(np.float32)
    for cx, cy, sx, sy in ((12, 5, 4, 8), (-20, 14, 10, 3), (3, -25, 5, 5)):
        m = 1500
        seeds = np.concatenate([seeds, np.stack([
            cx + rng.rand(m).astype(np.float32) * sx,
            cy + rng.rand(m).astype(np.float32) * sy,
            rng.rand(m).astype(np.float32) * 6], 1)]).astype(np.float32)
    idx = rng.randint(0, len(seeds), n)
    xyz0 = (seeds[idx] + 0.05 * rng.randn(n, 3)).astype(np.float32)
    th = 0.35
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.array([1.5, -0.8, 0.1], np.float32)
    xyz1 = np.ascontiguousarray(xyz0 @ R.T + t, np.float32)
    return xyz0, xyz1, R, t


def main():
    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=5, inlier_model="ResUNetBN2C",
        inlier_conv1_kernel_size=3, voxel_size=0.3,
        inlier_feature_type="ones", dense_extent="384,384,48", bf16=True)
    dgr = DeepGlobalRegistration(config)
    xyz0, xyz1, R, t = lidar_like_pair()

    t0 = time.time()
    T = dgr.register(xyz0, xyz1)
    print(f"first call (compile) {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        T = dgr.register(xyz0, xyz1)
        times.append(time.time() - t0)
    print(f"steady {min(times):.2f}s/pair", flush=True)

    assert np.isfinite(T).all(), "non-finite transform"
    RE = np.degrees(np.arccos(np.clip(
        (np.trace(T[:3, :3].T @ R) - 1) / 2, -1, 1)))
    TE = float(np.linalg.norm(T[:3, 3] - t))
    print(f"informational (random weights): RE={RE:.2f} deg TE={TE:.3f} m")
    print("KITTI-scale smoke OK")


if __name__ == "__main__":
    main()
