"""Dataset concatenation (the reference uses torch ConcatDataset for the
syrip_concat training mix, train_pose_mini.py:178-196)."""
from __future__ import annotations

import numpy as np


class ConcatDataset:
    """Concatenate datasets along the sample axis; exposes the array fields
    the trainer and eval helpers need (db_2d/db_3d/camera_param/gt_dataset)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.db_3d = np.concatenate([np.asarray(d.db_3d) for d in self.datasets])
        try:
            self.db_2d = np.concatenate([np.asarray(d.db_2d) for d in self.datasets])
        except ValueError:  # mismatched 2D channel counts across sets
            self.db_2d = np.zeros_like(self.db_3d)
        cams = [getattr(d, "camera_param", None) for d in self.datasets]
        if all(c is not None and len(c) for c in cams):
            self.camera_param = np.concatenate([np.asarray(c) for c in cams])
        else:
            self.camera_param = None
        gts = [getattr(d, "gt_dataset", None) for d in self.datasets]
        self.gt_dataset = (
            sum((list(g) for g in gts), []) if all(g is not None for g in gts) else None
        )
        self._lengths = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self._lengths)

    def __getitem__(self, idx):
        for d, n in zip(self.datasets, self._lengths):
            if idx < n:
                return d[idx]
            idx -= n
        raise IndexError(idx)
