"""Generate hypothesis-cluster init poses from a training set.

The reference ships `clusters/{h36m,3dhp,h36m_sitting}_cluster{S}.npy` as
opaque artifacts (loaded at run/opt_main.py:58-65) with no generation code
(it imports scipy.cluster.vq / sklearn KMeans but never calls them,
opt_main_infant.py:25,34). This tool closes the loop: k-means over
root-centered training poses -> [S, j, 3] cluster centers.

    python tools/make_clusters.py poses.npy clusters/my_cluster5.npy 5
    python tools/make_clusters.py --dataset h36m --data_dir data \
        clusters/h36m_cluster5.npy 5   # source omitted with --dataset

`poses.npy` is any [N, j, 3] array; --dataset routes through the data layer.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from scipy.cluster.vq import kmeans2

# zedo_tpu is not pip-installed; run the tool from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clusters(poses: np.ndarray, s: int, seed: int = 0) -> np.ndarray:
    """k-means cluster centers of root-centered poses: [N, j, 3] -> [S, j, 3]."""
    poses = np.asarray(poses, np.float64)
    poses = poses - poses[:, 0:1]
    n, j, d = poses.shape
    flat = poses.reshape(n, j * d)
    if s == 1:
        return poses.mean(axis=0, keepdims=True).astype(np.float32)
    centers, _ = kmeans2(flat, s, minit="++", seed=seed)
    return centers.reshape(s, j, d).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source", nargs="?", default=None,
                    help="[N, j, 3] .npy of training poses (omit with --dataset)")
    ap.add_argument("out", help="output .npy path")
    ap.add_argument("s", type=int, help="number of clusters / hypotheses")
    ap.add_argument("--dataset", default=None,
                    help="load poses via the data layer instead (h36m/3dpw/...)")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.dataset:
        from pathlib import Path

        from zedo_tpu.data import DATASETS

        if args.dataset in ("mini", "syrip"):
            # infant readers take (subset, ...) with a data_root kwarg
            ds = DATASETS[args.dataset](
                "train", gt2d=True,
                data_root=str(Path(args.data_dir,
                                   "mini-rgbd" if args.dataset == "mini"
                                   else "syrip")))
        else:
            ds = DATASETS[args.dataset](Path(args.data_dir, args.dataset),
                                        "train", gt2d=True, abs_coord=False)
        poses = np.asarray(ds.db_3d)
    elif args.source:
        poses = np.load(args.source)
    else:
        ap.error("provide a source .npy or --dataset")

    clusters = make_clusters(poses, args.s, seed=args.seed)
    np.save(args.out, clusters)
    print(f"wrote {clusters.shape} clusters to {args.out}")


if __name__ == "__main__":
    main()
