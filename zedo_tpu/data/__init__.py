"""Dataset layer: format-faithful readers + device-batched evaluation."""
from zedo_tpu.data.base import PoseDataset, flip_data, unflip_data
from zedo_tpu.data.custom import CustomDataset
from zedo_tpu.data.h36m import H36MDataset3D
from zedo_tpu.data.mini_rgbd import mini_rgbd
from zedo_tpu.data.mpii3dhp import MPII3DHP
from zedo_tpu.data.pw3d import PW3D
from zedo_tpu.data.ski import skiPose
from zedo_tpu.data.syrip import syrip

DATASETS = {
    "h36m": H36MDataset3D,
    "3dhp": MPII3DHP,
    "3dpw": PW3D,
    "ski": skiPose,
    "mini": mini_rgbd,
    "syrip": syrip,
    "wild": CustomDataset,
}

__all__ = [
    "PoseDataset", "H36MDataset3D", "MPII3DHP", "PW3D", "skiPose",
    "mini_rgbd", "syrip", "CustomDataset", "DATASETS", "flip_data",
    "unflip_data",
]
