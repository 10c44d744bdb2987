"""Infant-prior default config (reference configs/default_mini_configs.py)."""
import os as _os
import sys as _sys

# config files are loaded by PATH (ml_collections config_flags); make the
# repo root importable regardless of the caller's cwd
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import ml_collections

from configs.default_pose_gen_configs import get_default_configs as _adult


def get_default_configs():
    config = _adult()
    # infant deltas (reference default_mini_configs.py:10-17,62)
    config.DATASET.TRAIN_DATASET = "concate"
    config.DATASET.TEST_DATASET = "concate"
    config.DATASET.NUM_JOINT = 12
    config.training.batch_size = 5000
    config.eval.batch_size = 1024
    config.data.random_flip = False
    return config
