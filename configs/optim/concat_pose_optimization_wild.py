"""In-the-wild eval config (reference configs/optim/concat_pose_optimization_wild.py)."""
import os as _os
import sys as _sys

# config files are loaded by PATH (ml_collections config_flags); make the
# repo root importable regardless of the caller's cwd
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "../..")))

from configs.default_pose_gen_configs import get_default_configs
from configs.optim._base import build_optim_config


def get_config():
    return build_optim_config(
        get_default_configs, "wild",
        dict(IPO_keylist=[0, 1, 4], RotAxes="z", IPO_T=3,
             IPO_minScaleT=0.5, IPO_maxScaleT=2, sample=640, batch=886),
    )
