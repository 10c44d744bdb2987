"""SyRIP COCO-json downloads -> .npy maps (reference syrip_process.py).

Builds (a) {train,test}_rysip.npy: image-name maps splitting the 700-image
set by membership in the train-200 COCO json, and (b) {train,test}_pose2d.npy:
per-image {h, w, bbox, keypoints [j, 3]} dicts from the validate-500 jsons.

Usage: python -m zedo_tpu.data.prep.syrip_process [data_root [out_dir]]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np


def _pose_dict(coco: dict) -> dict:
    out = {}
    for i in range(len(coco["images"])):
        name = coco["images"][i]["file_name"]
        out[name] = {
            "h": coco["images"][i]["height"],
            "w": coco["images"][i]["width"],
            "bbox": coco["annotations"][i]["bbox"],
            "keypoints": np.array(coco["annotations"][i]["keypoints"]).reshape((-1, 3)),
        }
    return out


def process(data_root: str, out_dir: str = "."):
    with open(
        os.path.join(data_root, "SyRIP_2d_gt/train200/person_keypoints_train_infant.json")
    ) as f:
        pose2d = json.load(f)
    name_map = np.load(os.path.join(data_root, "survey_data/img_name700_map.npy"))

    real_test = [
        pose2d["images"][i]["file_name"].split("/")[-1]
        for i in range(len(pose2d["images"]))
    ]
    train, test = {}, {}
    for idx, pair in enumerate(name_map):
        if pair[1] not in real_test:
            train[pair[0]] = [pair[1], idx]
        else:
            test[pair[0]] = [pair[1], idx]
    np.save(os.path.join(out_dir, "test_rysip.npy"), test)
    np.save(os.path.join(out_dir, "train_rysip.npy"), train)

    with open(
        os.path.join(
            data_root, "SyRIP_2d_gt/validate500/person_keypoints_validate_infant.json"
        )
    ) as f:
        np.save(os.path.join(out_dir, "test_pose2d.npy"), _pose_dict(json.load(f)))
    with open(
        os.path.join(
            data_root, "SyRIP_2d_gt/validate500/person_keypoints_train_infant.json"
        )
    ) as f:
        np.save(os.path.join(out_dir, "train_pose2d.npy"), _pose_dict(json.load(f)))


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "data"
    out = sys.argv[2] if len(sys.argv) > 2 else "."
    process(root, out)
