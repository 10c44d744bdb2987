"""SkiPose eval config (reference configs/optim/concat_pose_optimization_ski.py)."""
import os as _os
import sys as _sys

# config files are loaded by PATH (ml_collections config_flags); make the
# repo root importable regardless of the caller's cwd
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "../..")))

from configs.default_pose_gen_configs import get_default_configs
from configs.optim._base import ALL_17, build_optim_config


def get_config():
    return build_optim_config(
        get_default_configs, "ski",
        dict(IPO_keylist=ALL_17, RotAxes="y", IPO_T=20,
             IPO_minScaleT=0.5, IPO_maxScaleT=2, sample=1, batch=1716),
    )
