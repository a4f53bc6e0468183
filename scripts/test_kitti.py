"""KITTI benchmark (reference scripts/test_kitti.py:59-143).

Same evaluation loop over KITTINMPairDataset with thresholds TE < 0.6 m,
RE < 5 deg (reference :33-34); per-pair time = registration wall clock
(the pipeline's feat/reg timers mirror :83).

Run: python -m scripts.test_kitti --kitti_dir <dir> --weights <ckpt> \
         --dataset KITTINMPairDataset
"""

import logging
import os

import numpy as np

from deepglobalregistration_tpu.config import get_config
from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
from deepglobalregistration_tpu.data.factory import make_data_loader
from deepglobalregistration_tpu.utils.timer import Timer

logging.basicConfig(format="%(asctime)s %(message)s", datefmt="%m/%d %H:%M:%S",
                    level=logging.INFO)
log = logging.getLogger()

TE_THRESH = 0.6  # m (reference test_kitti.py:33)
RE_THRESH = 5.0  # deg (reference test_kitti.py:34)


def evaluate(config, data_loader, method):
    data_iter = iter(data_loader)
    n = len(data_loader.dataset)
    stats = np.zeros((n, 5))

    for i in range(n):
        batch = next(data_iter)
        xyz0 = batch["pcd0"][0]
        xyz1 = batch["pcd1"][0]
        T_gt = np.asarray(batch["T_gt"][0])

        timer = Timer()
        timer.tic()
        T = method.register(xyz0, xyz1)
        wall = timer.toc(average=False)

        te = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
        re = np.rad2deg(np.arccos(np.clip(
            (np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -0.9999, 0.9999)))
        stats[i] = [te < TE_THRESH and re < RE_THRESH, te, re, wall, 0]
        log.info("pair %d/%d succ=%d te=%.3f re=%.3f t=%.2fs", i, n,
                 int(stats[i, 0]), te, re, wall)

    succ = stats[:, 0] > 0
    log.info("KITTI: recall %.4f  TE %.4f m  RE %.4f deg  time %.2f s",
             succ.mean(), stats[succ, 1].mean() if succ.any() else np.nan,
             stats[succ, 2].mean() if succ.any() else np.nan, stats[:, 3].mean())
    os.makedirs(config.out_dir, exist_ok=True)
    np.savez(os.path.join(config.out_dir, "kitti-stats.npz"), stats=stats[None])
    return stats


from deepglobalregistration_tpu.utils.platform import (
    enable_compilation_cache, select_platform)

if __name__ == "__main__":
    enable_compilation_cache()
    select_platform()
    config = get_config()
    if config.dataset not in ("KITTIPairDataset", "KITTINMPairDataset",
                              "SyntheticLidarPairDataset"):
        config.dataset = "KITTINMPairDataset"
    dgr = DeepGlobalRegistration(config)
    loader = make_data_loader(config, "test", batch_size=1,
                              num_workers=config.test_num_workers, shuffle=False)
    evaluate(config, loader, dgr)
