"""Checkpoint/cluster conversion CLI.

    python tools/convert_checkpoint.py pth2native checkpoint_1500.pth out_dir/
    python tools/convert_checkpoint.py native2pth out_dir/ checkpoint.pth
    python tools/convert_checkpoint.py cluster h36m_cluster50.pkl h36m_cluster50.npy

pth2native: reference torch checkpoint -> orbax pytree (params + merged EMA).
native2pth: zedo_tpu orbax checkpoint -> reference-format .pth (DataParallel
  'module.' prefix, EMA shadow list in parameter order) so results remain
  interchangeable with the upstream tooling.
cluster: README-shipped .pkl cluster files -> the .npy the loaders expect
  (SURVEY §6: opt_main loads .npy while the README ships .pkl names).
"""
from __future__ import annotations

import os
import sys

import numpy as np

# zedo_tpu is not pip-installed; run the tool from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pth2native(src: str, dst: str, n_joints: int = 17):
    from zedo_tpu.models.score_mlp import ScoreMLPConfig
    from zedo_tpu.utils.checkpoint import load_torch_checkpoint, save_native

    cfg = ScoreMLPConfig(n_joints=n_joints)
    ckpt = load_torch_checkpoint(src, cfg)
    save_native(dst, {
        "epoch": ckpt["epoch"],
        "params": ckpt["params"],
        "ema": {"decay": 0.9999, "num_updates": ckpt["step"],
                "shadow_params": ckpt["ema_params"] or ckpt["params"]},
        "opt_state": None,
        "step": ckpt["step"],
    })
    print(f"wrote orbax checkpoint to {dst}")


def native2pth(src: str, dst: str, n_joints: int = 17):
    import torch

    from zedo_tpu.models.score_mlp import ScoreMLPConfig
    from zedo_tpu.utils.checkpoint import _param_order, restore_native, tree_to_flat

    cfg = ScoreMLPConfig(n_joints=n_joints)
    ckpt = restore_native(src)
    flat = {k: torch.tensor(np.asarray(v)) for k, v in tree_to_flat(ckpt["params"]).items()}
    state_dict = {"module." + k: v for k, v in flat.items()}
    shadow_tree = tree_to_flat(ckpt["ema"]["shadow_params"])
    shadow = [torch.tensor(np.asarray(shadow_tree[name])) for name in _param_order(cfg)]
    torch.save(
        {
            "epoch": int(np.asarray(ckpt.get("epoch", 0))),
            "model_state_dict": state_dict,
            "optimizer_state_dict": None,
            "ema": {"decay": float(np.asarray(ckpt["ema"]["decay"])),
                    "num_updates": int(np.asarray(ckpt["ema"]["num_updates"])),
                    "shadow_params": shadow},
            "step": int(np.asarray(ckpt.get("step", 0))),
        },
        dst,
    )
    print(f"wrote torch checkpoint to {dst}")


def cluster(src: str, dst: str):
    from zedo_tpu.utils.checkpoint import convert_cluster_file

    arr = convert_cluster_file(src)
    np.save(dst, np.asarray(arr))
    print(f"wrote {np.asarray(arr).shape} clusters to {dst}")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    mode, src, dst = sys.argv[1:4]
    kwargs = {}
    if len(sys.argv) > 4:
        kwargs["n_joints"] = int(sys.argv[4])
    {"pth2native": pth2native, "native2pth": native2pth, "cluster": cluster}[mode](
        src, dst, **kwargs
    )
