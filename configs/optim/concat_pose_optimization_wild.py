"""In-the-wild eval config (reference configs/optim/concat_pose_optimization_wild.py)."""
from configs.default_pose_gen_configs import get_default_configs
from configs.optim._base import build_optim_config


def get_config():
    return build_optim_config(
        get_default_configs, "wild",
        dict(IPO_keylist=[0, 1, 4], RotAxes="z", IPO_T=3,
             IPO_minScaleT=0.5, IPO_maxScaleT=2, sample=640, batch=886),
    )
