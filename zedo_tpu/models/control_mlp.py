"""ControlNet-style infant adapter over ScoreMLP (reference
`Control_ScoreModelFC_Adv`, lib/algorithms/advanced/control_model.py:97-382).

Every trunk layer is duplicated as `*_copy`; zero-conv-like `zc_*` linear
bridges inject the control branch into the trunk; a learnable `infant_cond`
vector [j*d] seeds the control branch. `init_control_params` copies trunk
weights into the copy branch (control_model.py:235-261); only
copy/zc/infant_cond leaves are trainable (`trainable_mask`, the freeze()
semantics at control_model.py:224-232).

Replicated checked-in quirk: in each block's second control layer the temb
projection OVERWRITES the activation instead of adding
(`c = dense2_t_copy(temb)`, control_model.py:341 uses `=`, not `+=`).
Released ZeDO-i checkpoints were trained with this dataflow, so it is kept
verbatim.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from zedo_tpu.models import nn
from zedo_tpu.models.score_mlp import ScoreMLPConfig, init_params as init_trunk_params, time_embedding

Params = dict


def init_params(key: jax.Array, cfg: ScoreMLPConfig, dtype=jnp.float32) -> Params:
    """Trunk params + zc bridges + infant_cond; the `*_copy` branch is built
    by init_control_params as an exact trunk copy (the reference's
    init_weight, control_model.py:235-261), so no random copy-branch init
    exists to discard."""
    keys = jax.random.split(key, 2)
    p = init_trunk_params(keys[0], cfg, dtype)
    h, io = cfg.hidden_dim, cfg.n_joints * cfg.joint_dim
    sub = iter(jax.random.split(keys[1], 3 + 2 * cfg.n_blocks))
    p["infant_cond"] = jax.random.normal(next(sub), (io,), dtype)
    p["zc_layer_1"] = nn.init_linear(next(sub), io, io, dtype)
    p["zc_layer_2"] = nn.init_linear(next(sub), h, h, dtype)
    for idx in range(cfg.n_blocks):
        p[f"zc_b{idx + 1}_1"] = nn.init_linear(next(sub), h, h, dtype)
        p[f"zc_b{idx + 1}_2"] = nn.init_linear(next(sub), h, h, dtype)
    return init_control_params(p, cfg)


def init_control_params(params: Params, cfg: ScoreMLPConfig) -> Params:
    """Copy trunk weights into the `_copy` branch (control_model.py:235-261)."""
    p = dict(params)
    copy_pairs = ["pre_dense", "pre_dense_t", "pre_gnorm"]
    for idx in range(cfg.n_blocks):
        copy_pairs += [
            f"b{idx + 1}_dense1", f"b{idx + 1}_dense1_t", f"b{idx + 1}_gnorm1",
            f"b{idx + 1}_dense2", f"b{idx + 1}_dense2_t", f"b{idx + 1}_gnorm2",
        ]
    for name in copy_pairs:
        p[name + "_copy"] = jax.tree.map(jnp.array, p[name])
    return p


def trainable_mask(params: Params) -> dict:
    """True for copy/zc/infant_cond leaves — the freeze() semantics
    (control_model.py:224-232). Feed to optax.masked for fine-tuning."""

    def mark(key, value):
        trainable = "copy" in key or "zc" in key or key == "infant_cond"
        if isinstance(value, dict):
            return {k: mark(key + "." + k, v) for k, v in value.items()}
        return trainable

    return {k: mark(k, v) for k, v in params.items()}


def apply(
    params: Params,
    cfg: ScoreMLPConfig,
    batch: jax.Array,
    t_labels: jax.Array,
    condition: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    precision=None,
) -> jax.Array:
    """Forward (control_model.py:277-382)."""
    del condition, mask
    bs = batch.shape[0]
    x = batch.reshape(bs, -1)
    g = cfg.group_norm_groups

    drop_keys = iter(jax.random.split(rng, 2 + 4 * cfg.n_blocks)) if train else iter([])

    def drop(v):
        return nn.dropout(v, cfg.dropout, train, next(drop_keys) if train else None)

    temb = time_embedding(params, cfg, t_labels)
    if cfg.embedding_type == "fourier":
        used_sigmas = t_labels
    else:
        used_sigmas = params["sigmas"][t_labels.astype(jnp.int32)]

    # control branch seed: batch + act(zc_1(infant_cond))
    c = nn.silu(nn.linear(params["zc_layer_1"], params["infant_cond"], precision))
    c = x + c

    c = nn.linear(params["pre_dense_copy"], c, precision)
    c = c + nn.linear(params["pre_dense_t_copy"], temb, precision)
    c0 = nn.linear(params["zc_layer_2"], c, precision)
    c = nn.group_norm(params["pre_gnorm_copy"], c, g)
    c = drop(nn.silu(c))

    h = nn.linear(params["pre_dense"], x, precision)
    h = h + nn.linear(params["pre_dense_t"], temb, precision)
    h = h + c0
    h = nn.group_norm(params["pre_gnorm"], h, g)
    h = drop(nn.silu(h))

    for idx in range(cfg.n_blocks):
        orc = c
        c = nn.linear(params[f"b{idx + 1}_dense1_copy"], c, precision)
        c = c + nn.linear(params[f"b{idx + 1}_dense1_t_copy"], temb, precision)
        c1 = nn.linear(params[f"zc_b{idx + 1}_1"], c, precision)
        c = nn.group_norm(params[f"b{idx + 1}_gnorm1_copy"], c, g)
        c = drop(nn.silu(c))

        c = nn.linear(params[f"b{idx + 1}_dense2_copy"], c, precision)
        # checked-in quirk: `=` not `+=` (control_model.py:341) — the dense2
        # activation is discarded in favor of the temb projection
        c = nn.linear(params[f"b{idx + 1}_dense2_t_copy"], temb, precision)
        c = jnp.broadcast_to(c, orc.shape)
        c2 = nn.linear(params[f"zc_b{idx + 1}_2"], c, precision)
        c = nn.group_norm(params[f"b{idx + 1}_gnorm2_copy"], c, g)
        c = drop(nn.silu(c))
        c = orc + c

        h1 = nn.linear(params[f"b{idx + 1}_dense1"], h, precision)
        h1 = h1 + nn.linear(params[f"b{idx + 1}_dense1_t"], temb, precision)
        h1 = h1 + c1
        h1 = nn.group_norm(params[f"b{idx + 1}_gnorm1"], h1, g)
        h1 = drop(nn.silu(h1))

        h2 = nn.linear(params[f"b{idx + 1}_dense2"], h1, precision)
        h2 = h2 + nn.linear(params[f"b{idx + 1}_dense2_t"], temb, precision)
        h2 = h2 + c2
        h2 = nn.group_norm(params[f"b{idx + 1}_gnorm2"], h2, g)
        h2 = drop(nn.silu(h2))

        h = h + h2

    res = nn.linear(params["post_dense"], h, precision)
    res = res.reshape(bs, cfg.n_joints, -1)
    if cfg.scale_by_sigma:
        res = res / used_sigmas.reshape(bs, 1, 1)
    return res
