"""Infant-prior default config (reference configs/default_mini_configs.py)."""
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
