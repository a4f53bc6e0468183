"""Registration demo (reference demo.py:14-48).

With --weights + --pcd0/--pcd1 it registers the given PLY pair using pretrained
models. With no arguments (or --synthetic) it runs a self-contained synthetic
demo: a random room scan registered against a rigidly-moved copy of itself —
useful in environments without the released checkpoints (zero egress).
"""

import logging
import sys

import numpy as np

from deepglobalregistration_tpu.config import get_config
from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
from deepglobalregistration_tpu.ops import metrics
from deepglobalregistration_tpu.utils.pointcloud import read_point_cloud

logging.basicConfig(format="%(asctime)s %(message)s", datefmt="%m/%d %H:%M:%S",
                    level=logging.INFO)


def synthetic_pair(n=30000, seed=0):
    rng = np.random.RandomState(seed)
    # a "room": three walls + floor, surface-like sampling
    walls = []
    for _ in range(4):
        u = rng.rand(n // 4, 2) * 3
        axis = rng.randint(3)
        pts = np.zeros((n // 4, 3), np.float32)
        pts[:, [i for i in range(3) if i != axis]] = u
        pts[:, axis] = rng.rand() * 3
        walls.append(pts + 0.01 * rng.randn(n // 4, 3))
    xyz0 = np.concatenate(walls).astype(np.float32)
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("zyx", [25, 10, -15], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.4, -0.3, 0.2], np.float32)
    xyz1 = (xyz0 @ R.T + t)[rng.permutation(len(xyz0))]
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t
    return xyz0, xyz1, T_gt


from deepglobalregistration_tpu.utils.platform import (
    enable_compilation_cache, select_platform)

if __name__ == "__main__":
    enable_compilation_cache()
    select_platform()
    config = get_config()

    if config.weights:
        dgr = DeepGlobalRegistration(config)
        xyz0 = read_point_cloud(config.pcd0)
        xyz1 = read_point_cloud(config.pcd1)
        T = dgr.register(xyz0, xyz1)
        print("Estimated transformation:\n", T)
        sys.exit(0)

    print("No --weights given: running the synthetic self-registration demo.")
    from pathlib import Path

    bundled = Path(__file__).resolve().parent / "weights" / "fcgf_synthetic.pkl"
    if bundled.exists():
        # Committed self-trained FCGF features (tools/export_bench_weights.py)
        # — the demo then runs the learned path, like the reference demo runs
        # its downloaded pretrained weights (reference demo.py:14-48).
        config.weights = str(bundled)
    else:
        config.feat_model = "ResUNetBN2C"
        config.feat_model_n_out = 32
        config.feat_conv1_kernel_size = 7
        config.inlier_model = "ResUNetBN2C"
        config.voxel_size = 0.05
    dgr = DeepGlobalRegistration(config)
    xyz0, xyz1, T_gt = synthetic_pair()
    T = dgr.register(xyz0, xyz1)
    import jax.numpy as jnp

    ok, rte, rre = metrics.rte_rre(jnp.asarray(T.astype(np.float32)),
                                   jnp.asarray(T_gt), 0.3, 15.0)
    print("Estimated transformation:\n", T)
    print(f"vs ground truth: RTE {float(rte)*100:.2f} cm, RRE {float(rre):.2f} deg, "
          f"success(0.3m/15deg)={bool(ok)}")
    if not bundled.exists():
        print("(random-initialized networks: the learned inlier gate is "
              "untrained, so the pipeline exercises the safeguard/ICP path)")
    elif not dgr.inlier_trained:
        # The bundled checkpoint is feature-only: trained FCGF features, but
        # the 6D inlier gate is still random-initialized.
        print("(feature-only weights: FCGF is trained but the learned inlier "
              "gate is untrained — weights may be conservative)")
