"""Checkpoint I/O: torch .pth conversion and orbax-based native checkpoints.

The reference trains with torch and ships checkpoints whose state_dict keys
follow ScoreModelFC_Adv's module names, wrapped in DataParallel's `module.`
prefix, inside a dict {epoch, model_state_dict, optimizer_state_dict, ema,
step} (train_pose_mini.py:389-397, loaded at opt_main.py:125-137). This module
converts those to zedo_tpu param pytrees, and provides orbax save/restore for
native training.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from zedo_tpu.models.score_mlp import ScoreMLPConfig

# torch parameter definition order of ScoreModelFC_Adv (model.py:113-152),
# used to map the EMA shadow_params LIST (ema.py:28-29 keeps only
# requires_grad params, in model.parameters() order) back to names.
# gauss_proj.W is requires_grad=False and `sigmas` is a buffer — excluded.


def _param_order(cfg: ScoreMLPConfig) -> list[str]:
    names = [
        "pre_dense.weight", "pre_dense.bias",
        "pre_dense_t.weight", "pre_dense_t.bias",
        "pre_gnorm.weight", "pre_gnorm.bias",
        "shared_time_embed.0.weight", "shared_time_embed.0.bias",
    ]
    for idx in range(cfg.n_blocks):
        for layer in ("dense1", "dense1_t", "gnorm1", "dense2", "dense2_t", "gnorm2"):
            names += [f"b{idx + 1}_{layer}.weight", f"b{idx + 1}_{layer}.bias"]
    names += ["post_dense.weight", "post_dense.bias"]
    return names


def strip_module_prefix(state_dict: dict) -> dict:
    """Remove DataParallel's 'module.' prefix (opt_main.py:127-132)."""
    out = {}
    for k, v in state_dict.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def flat_to_tree(flat: dict) -> dict:
    """'a.b.c' -> nested dicts; values converted to jnp arrays."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value))
    return tree


def tree_to_flat(tree: dict, prefix: str = "") -> dict:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(tree_to_flat(v, key + "."))
        else:
            flat[key] = v
    return flat


def params_from_torch_state_dict(state_dict: dict, cfg: ScoreMLPConfig) -> dict:
    """torch state_dict (possibly DataParallel-prefixed) -> params pytree.

    Keys map 1:1 because zedo_tpu param trees mirror torch module names
    (models/score_mlp.py init_params)."""
    flat = strip_module_prefix(state_dict)
    tree = flat_to_tree(flat)
    if "sigmas" not in tree:
        from zedo_tpu.models.score_mlp import get_sigmas

        tree["sigmas"] = jnp.asarray(get_sigmas(cfg))
    return tree


def ema_shadow_to_params(shadow_params: list, cfg: ScoreMLPConfig) -> dict:
    """EMA shadow list (positional, trainables only) -> params pytree.

    Buffers (`sigmas`, fourier `gauss_proj.W`) are not EMA-tracked; callers
    should merge this over converted model params (ema.py:28-29)."""
    names = _param_order(cfg)
    if len(names) != len(shadow_params):
        raise ValueError(
            f"EMA shadow length {len(shadow_params)} != expected {len(names)}"
        )
    flat = {n: jnp.asarray(np.asarray(p)) for n, p in zip(names, shadow_params)}
    return flat_to_tree(flat)


def load_torch_checkpoint(path: str, cfg: ScoreMLPConfig) -> dict:
    """Load a reference .pth checkpoint into
    {params, ema_params (merged over params), step, epoch}.

    Requires torch (CPU build is fine) only at call time. Note the reference
    *loads* EMA at inference but never applies it (opt_main.py:135 — no
    copy_to); run scripts therefore use `params`, and expose --ema to opt
    into the shadow weights.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    params = params_from_torch_state_dict(state_dict, cfg)

    ema_params = None
    if "ema" in ckpt and ckpt["ema"] is not None:
        shadow = [p.numpy() for p in ckpt["ema"]["shadow_params"]]
        try:
            ema_tree = ema_shadow_to_params(shadow, cfg)
            ema_params = _merge(params, ema_tree)
        except ValueError as e:
            # non-ScoreMLP trainable sets (e.g. ControlNet adapters track only
            # copy/zc/infant_cond params) have a different shadow order; the
            # reference never applies EMA at inference anyway (opt_main.py:135)
            print(f"note: EMA shadow list not mapped ({e}); --ema unavailable")
    return {
        "params": params,
        "ema_params": ema_params,
        "step": int(ckpt.get("step", 0)),
        "epoch": int(ckpt.get("epoch", 0)),
    }


def _merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def convert_cluster_file(path: str) -> np.ndarray:
    """Load cluster init poses from .npy or .pkl.

    The README ships `*_cluster*.pkl` names (Readme.md:152-156) while
    opt_main loads `.npy` (opt_main.py:59-65); accept both."""
    if path.endswith(".npy"):
        return np.load(path, allow_pickle=True)
    import pickle

    with open(path, "rb") as f:
        return np.asarray(pickle.load(f))


def to_flattened_numpy(x) -> np.ndarray:
    """Flatten a device array to 1-D numpy (reference utils.py:803-805)."""
    return np.asarray(x).reshape((-1,))


def from_flattened_numpy(x: np.ndarray, shape) -> jnp.ndarray:
    """1-D numpy -> device array of `shape` (reference utils.py:808-810)."""
    return jnp.asarray(np.asarray(x).reshape(shape))


# ------------------------------------------------------------------ orbax
def save_native(path: str, payload: dict) -> None:
    """Save {step, params, ema, opt_state, ...} with orbax (atomic)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def restore_native(path: str, item=None) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path, item=item)


def load_any_checkpoint(path: str, cfg: ScoreMLPConfig, use_ema: bool = False,
                        log=print):
    """Reference `.pth` or orbax-native checkpoint -> (params, step).

    Selects the EMA shadow weights when `use_ema` and the checkpoint
    carries them, with a loud note otherwise (the reference loads EMA at
    inference but never applies it, opt_main.py:135 — so raw weights are
    the parity default and --ema is the opt-in). One shared implementation
    for opt_main / opt_main_infant / sample / serving; the per-CLI copies
    had already drifted (package review r4)."""
    if path.endswith(".pth"):
        ckpt = load_torch_checkpoint(path, cfg)
    else:
        raw = restore_native(path)
        ckpt = {"params": raw["params"],
                "ema_params": (raw.get("ema") or {}).get("shadow_params"),
                "step": raw.get("step", 0)}
    if use_ema and not ckpt.get("ema_params"):
        log("note: --ema requested but the checkpoint carries no EMA "
            "shadow params; using the raw weights")
    params = (ckpt["ema_params"] if (use_ema and ckpt.get("ema_params"))
              else ckpt["params"])
    step = ckpt.get("step", 0)
    return params, int(np.asarray(step)) if step is not None else 0
