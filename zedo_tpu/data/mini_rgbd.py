"""MINI-RGBD infant dataset (reference lib/dataset/mini_rgbd.py).

Format: `MINI-RGBD.npy` — a dict {'train'|'validate': {frame_key:
{'pose_2d' [25, 2], 'pose_3d' [25, 3]}}} produced by the prep script
(data/prep/mini_process.py). Fixed Kinect intrinsics; SMIL-25 joints mapped
to H36M-17 via `SMIL_TO_H36M`, optionally down to 12 via `CHANGE_TO_12`.
"""
from __future__ import annotations

import os

import numpy as np

from zedo_tpu.data import evaluation
from zedo_tpu.data.base import PoseDataset

SMIL_TO_H36M = [0, 2, 5, 11, 1, 4, 10, 3, 9, 12, 15, 13, 18, 20, 14, 19, 21]
CHANGE_TO_12 = [1, 2, 3, 4, 5, 6, 11, 12, 13, 14, 15, 16]
MINI_K = dict(
    fx=588.67905803875317, fy=590.25690113005601,
    cx=322.22048191353628, cy=237.46785983766890,
)


class mini_rgbd(PoseDataset):  # noqa: N801 — reference class name
    def __init__(self, subset="train", num_joint=17, aug=False, scale=1.0,
                 normed=False, cls=False, data_root="data/mini-rgbd",
                 aug_path="aug_mini.npy", save_gt_path=None, **kwargs):
        self.num_joint = num_joint
        self.aug = aug
        self.scale = scale
        self.normed = normed
        self.cls = cls
        self.data_root = data_root
        self.aug_path = aug_path
        # the reference side-effect-saves 'mini_gt_gt.npy' on load
        # (mini_rgbd.py:303); opt-in here
        self.save_gt_path = save_gt_path
        self.K: list = []
        super().__init__(subset=subset, **kwargs)

    @staticmethod
    def norm(pose_3d):
        return 2 * (pose_3d - pose_3d.min()) / (pose_3d.max() - pose_3d.min()) - 1

    def read_data(self):
        data = np.load(
            os.path.join(self.data_root, "MINI-RGBD.npy"), allow_pickle=True
        ).item()
        data = data[self.subset]

        pose_3d, pose_2d, frame_name = [], [], []
        k = np.zeros((3, 3), dtype=np.float32)
        k[0, 0], k[1, 1] = MINI_K["fx"], MINI_K["fy"]
        k[0, 2], k[1, 2] = MINI_K["cx"], MINI_K["cy"]
        k[2, 2] = 1
        for item in data.keys():
            pose_3d.append(data[item]["pose_3d"])
            pose_2d.append(data[item]["pose_2d"])
            self.K.append(k.copy())
            frame_name.append(item)

        pose_3d = np.array(pose_3d, dtype=np.float32)
        pose_2d = np.array(pose_2d, dtype=np.float32)
        frame_name = np.array(frame_name)

        if not self.abs_coord:
            self.root = pose_3d[:, 0:1]
            pose_3d = pose_3d - pose_3d[:, 0:1]
        if self.normed:
            pose_3d = self.norm(pose_3d)

        if self.num_joint == 17:
            pose_2d = pose_2d[:, SMIL_TO_H36M]
            pose_3d = pose_3d[:, SMIL_TO_H36M]

        if self.aug:
            # augmentation poses with random per-sample shrink
            # (mini_rgbd.py:288-293). HAZARD (preserved, reference-faithful,
            # mini_rgbd.py:283-287): when aug lengthens the set, the
            # reference replaces 2D/K wholesale with zeros_like(pose_3d) —
            # db_2d becomes all-zero and camera_param becomes a malformed
            # [N, j, 3] zero tensor instead of [N, 3, 3] intrinsics. Only
            # the prior TRAINER (which reads db_3d alone) can consume an
            # aug=True dataset; solve/eval paths must not.
            aug_data = np.load(self.aug_path)
            aug_data = aug_data / self.rng.uniform(0.8, 1.2, (len(aug_data), 1, 1))
            pose_3d = np.concatenate([pose_3d, aug_data.astype(np.float32)], axis=0)
            if len(pose_2d) != len(pose_3d):
                pose_2d = np.zeros_like(pose_3d)
                frame_name = np.zeros(len(pose_3d))
                self.K = np.zeros_like(pose_3d)

        if self.num_joint == 12:
            pose_2d = pose_2d[:, CHANGE_TO_12, :]
            pose_3d = pose_3d[:, CHANGE_TO_12, :]
            # flip maps in the 12-joint ordering (positions of the H36M-17
            # left/right joints inside CHANGE_TO_12); the base H36M-17 maps
            # index up to 16 and would IndexError on 12-joint data. NOTE:
            # this ordering differs from syrip's CHANGE_12 convention (arms
            # land at different positions), so ConcatDataset.augment_batch
            # correctly refuses flip/rot on a mixed mini+syrip set.
            self.left_joints = [3, 4, 5, 6, 7, 8]
            self.right_joints = [0, 1, 2, 9, 10, 11]

        if self.save_gt_path:
            np.save(self.save_gt_path, pose_3d)

        self.db_2d = pose_2d
        self.db_3d = pose_3d
        self.frame_name = frame_name
        self.camera_param = np.array(self.K) if len(self.K) else np.zeros_like(pose_3d)

    def _strided_fields(self):
        return ["db_2d", "db_3d", "image_name", "camera_param", "frame_name"]

    def __getitem__(self, idx):
        """(data_2d, data_3d, K) — infant sets also return K
        (mini_rgbd.py:155-171)."""
        data_2d = self.db_2d[idx % self.real_data_len]
        data_3d = self.db_3d[idx % self.real_data_len]
        k = self.camera_param[idx % self.real_data_len]
        if self.scale > 1:
            data_3d = data_3d * self.scale
        if self.cls:
            data_2d = np.concatenate(
                [data_2d, np.ones((data_2d.shape[0], 1))], axis=-1
            )
            return data_2d, data_3d, k, np.array([0, 1])
        return data_2d, data_3d, k

    def save_action(self, action):
        """Attach per-sample action labels (mini_rgbd.py:208-212)."""
        self.action = action
        assert len(self.db_3d) == len(self.action)
        return self.action

    def eval_multi(self, preds, protocol2=False, print_verbose=False,
                   sample_interval=None, valid_ind=None, sample=None, mask_tok=None):
        """Mean MPJPE with the reference's 12->7 joint slice for j=12
        (mini_rgbd.py:307-370: pred/gt reduced to joints [1:7]+[11:] BEFORE
        alignment)."""
        print("eval multi-hypothesis...")
        preds = np.asarray(preds)
        gt = self.db_3d
        if sample_interval is not None:
            preds = preds[::sample_interval]
            gt = gt[::sample_interval]
        gt = gt - gt[:, 0:1]
        subset = None
        if gt.shape[-2] == 12:
            subset = list(range(1, 7)) + [11]
        report = evaluation.multi_hypothesis_eval(preds, gt, valid_ind=valid_ind, protocol2=protocol2,
            joint_subset=subset, subset_before_align=True,
        )
        print(f"mean MPJPE error: {report.error}")
        return report.error
