"""Training entry point (reference train.py:33-76).

Example:
    python train.py --dataset ThreeDMatchPairDataset03 \
        --threed_match_dir ~/dataset/threedmatch --feat_model ResUNetBN2C \
        --feat_model_n_out 32 --weights fcgf.pth
"""

import json
import logging
import os.path as osp
import random

import numpy as np

from deepglobalregistration_tpu.config import get_config
from deepglobalregistration_tpu.core.trainer import WeightedProcrustesTrainer
from deepglobalregistration_tpu.data.factory import make_data_loader

logging.basicConfig(
    format="%(asctime)s %(message)s",
    datefmt="%m/%d %H:%M:%S",
    level=logging.INFO)


def main(config, resume: bool = False):
    train_loader = make_data_loader(config, config.train_phase, config.batch_size,
                                    num_workers=config.train_num_workers)
    val_loader = None
    if config.test_valid:
        val_loader = make_data_loader(config, config.val_phase, config.val_batch_size,
                                      num_workers=config.val_num_workers)
    trainer = WeightedProcrustesTrainer(config=config, data_loader=train_loader,
                                        val_data_loader=val_loader)
    trainer.train()


from deepglobalregistration_tpu.utils.platform import (
    enable_compilation_cache, select_platform)

if __name__ == "__main__":
    enable_compilation_cache()
    select_platform()
    config = get_config()
    random.seed(config.__dict__.get("seed", 0))
    np.random.seed(0)

    # --resume_dir overlays the saved config (reference train.py:63-68)
    if config.resume_dir:
        with open(osp.join(config.resume_dir, "config.json")) as f:
            saved = json.load(f)
        for k, v in saved.items():
            if k not in ("resume_dir",) and hasattr(config, k):
                setattr(config, k, v)
        config.resume = osp.join(config.resume_dir, "checkpoint.pkl")

    main(config)
