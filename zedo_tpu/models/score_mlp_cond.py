"""Conditional score MLP — the role of the reference's MISSING
`lib/algorithms/advanced/model_cond.py` (`ScoreModelFC_Adv_cond`, imported at
run/opt_main_infant.py:23 but absent from the repo; SURVEY §2.2).

Reconstructed from the evident design left commented in the unconditional
model (model.py:115,134-138,144,149,225-237,244,262,266,274,282): a 2D/3D
condition is re-expressed as `batch - condition` with the z channel masked
for 2D conditions, embedded by a Linear+SiLU, and injected into every dense
layer through per-layer `*_cond` projections; train-time condition dropout
uses the pose/part/joint masking machinery (model.py:162-213).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.models import nn
from zedo_tpu.models.score_mlp import ScoreMLPConfig, init_params as init_trunk, time_embedding

Params = dict

# part_list (model.py:205-206): right leg, left leg, left arm, right arm, torso
PART_LIST = [[1, 2, 3], [4, 5, 6], [11, 12, 13], [14, 15, 16], [0, 7, 8, 9, 10]]


@dataclasses.dataclass(frozen=True)
class CondMaskConfig:
    """config.training.cond_*_mask_prob (default_pose_gen_configs.py:31-33)."""

    pose_mask_prob: float = 0.0
    part_mask_prob: float = 0.0
    joint_mask_prob: float = 0.0


def init_params(key: jax.Array, cfg: ScoreMLPConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 4 + 2 * cfg.n_blocks)
    p = init_trunk(keys[0], cfg, dtype)
    h = cfg.hidden_dim
    io_cond = cfg.n_joints * cfg.joint_dim  # unified 3-channel condition
    p["cond_embed"] = {"0": nn.init_linear(keys[1], io_cond, h, dtype)}
    p["pre_dense_cond"] = nn.init_linear(keys[2], h, h, dtype)
    for idx in range(cfg.n_blocks):
        p[f"b{idx + 1}_dense1_cond"] = nn.init_linear(keys[3 + 2 * idx], h, h, dtype)
        p[f"b{idx + 1}_dense2_cond"] = nn.init_linear(keys[4 + 2 * idx], h, h, dtype)
    return p


def part_mask_table(n_joints: int) -> np.ndarray:
    """[p, j] masks zeroing each body part (model.py:201-213)."""
    table = np.ones((len(PART_LIST), n_joints), dtype=np.float32)
    for idx, part in enumerate(PART_LIST):
        table[idx, [j for j in part if j < n_joints]] = 0
    return table


def random_mask_condition(
    rng: jax.Array, condition: jax.Array, cfg: ScoreMLPConfig,
    mask_cfg: CondMaskConfig,
) -> jax.Array:
    """Train-time condition dropout (model.py:162-199): whole-pose, body-part,
    and per-joint Bernoulli masking. condition: [B, j, c]."""
    b = condition.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    if mask_cfg.pose_mask_prob > 0:
        drop = jax.random.bernoulli(k1, mask_cfg.pose_mask_prob, (b, 1, 1))
        condition = condition * (1.0 - drop.astype(condition.dtype))
    if mask_cfg.part_mask_prob > 0:
        table = jnp.asarray(part_mask_table(cfg.n_joints))  # [p, j]
        sel = jax.random.bernoulli(k2, mask_cfg.part_mask_prob, (b, table.shape[0]))
        # product over selected parts' masks; all-ones when none selected
        masks = jnp.where(sel[..., None], table[None], jnp.ones_like(table)[None])
        joint_mask = jnp.prod(masks, axis=1)  # [b, j]
        condition = condition * joint_mask[..., None]
    if mask_cfg.joint_mask_prob > 0:
        drop = jax.random.bernoulli(k3, mask_cfg.joint_mask_prob, (b, cfg.n_joints, 1))
        condition = condition * (1.0 - drop.astype(condition.dtype))
    return condition


def apply(
    params: Params,
    cfg: ScoreMLPConfig,
    batch: jax.Array,
    t_labels: jax.Array,
    condition: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    *,
    mask_cfg: CondMaskConfig = CondMaskConfig(),
    train: bool = False,
    rng: Optional[jax.Array] = None,
    precision=None,
    force_null_condition: bool = False,
) -> jax.Array:
    """Forward with condition injection.

    condition: [B, j, 2|3] keypoints (2D padded with a zero z channel). Per
    the commented design (model.py:225-237): re-express as batch - condition
    with z masked out when the condition carries no depth; then embed.
    mask: eval-time condition mask [B, j, c] (model.py:235-237).
    force_null_condition: zero the RE-EXPRESSED condition tensor — the same
    null state train-time condition dropout produces (random_mask_condition
    zeroes `cond`, not the raw keypoints). Passing raw zeros instead would
    re-express to cond = batch.xy, a strong fake condition.
    """
    bs = batch.shape[0]
    g = cfg.group_norm_groups

    if condition is None:
        # no condition = the NULL state, not raw zero keypoints: zeros
        # would re-express below to cond = batch.xy (a strong fake
        # condition — see force_null_condition docstring). Every caller
        # that runs this model unconditionally (registry, OIL generic
        # path, eval sampling) gets the train-time dropout null.
        condition = jnp.zeros_like(batch)
        force_null_condition = True
    if condition.shape[-1] == 2:
        condition = jnp.concatenate(
            [condition, jnp.zeros_like(condition[..., :1])], axis=-1
        )
    # unified 2D/3D: nonzero z channel anywhere -> 3D condition (model.py:229)
    z_mask = (jnp.sum(jnp.abs(condition[:, :, -1]), axis=-1, keepdims=True) > 0)
    cond = batch - condition
    cond = cond.at[:, :, -1].multiply(z_mask.astype(cond.dtype))
    if force_null_condition:
        cond = jnp.zeros_like(cond)
    if not train and mask is not None:
        cond = cond * mask

    drop_rng = cond_rng = None
    if train:
        rng, cond_rng, drop_rng = jax.random.split(rng, 3)
        cond = random_mask_condition(cond_rng, cond, cfg, mask_cfg)

    cond_flat = cond.reshape(bs, -1)
    cond_h = nn.silu(nn.linear(params["cond_embed"]["0"], cond_flat, precision))

    temb = time_embedding(params, cfg, t_labels)
    if cfg.embedding_type == "fourier":
        used_sigmas = t_labels
    else:
        used_sigmas = params["sigmas"][t_labels.astype(jnp.int32)]

    drop_keys = iter(jax.random.split(drop_rng, 1 + 2 * cfg.n_blocks)) if train else iter([])

    def drop(v):
        return nn.dropout(v, cfg.dropout, train, next(drop_keys) if train else None)

    x = batch.reshape(bs, -1)
    h = nn.linear(params["pre_dense"], x, precision)
    h = h + nn.linear(params["pre_dense_t"], temb, precision)
    h = h + nn.linear(params["pre_dense_cond"], cond_h, precision)
    h = nn.group_norm(params["pre_gnorm"], h, g)
    h = drop(nn.silu(h))

    for idx in range(cfg.n_blocks):
        h1 = nn.linear(params[f"b{idx + 1}_dense1"], h, precision)
        h1 = h1 + nn.linear(params[f"b{idx + 1}_dense1_t"], temb, precision)
        h1 = h1 + nn.linear(params[f"b{idx + 1}_dense1_cond"], cond_h, precision)
        h1 = nn.group_norm(params[f"b{idx + 1}_gnorm1"], h1, g)
        h1 = drop(nn.silu(h1))

        h2 = nn.linear(params[f"b{idx + 1}_dense2"], h1, precision)
        h2 = h2 + nn.linear(params[f"b{idx + 1}_dense2_t"], temb, precision)
        h2 = h2 + nn.linear(params[f"b{idx + 1}_dense2_cond"], cond_h, precision)
        h2 = nn.group_norm(params[f"b{idx + 1}_gnorm2"], h2, g)
        h2 = drop(nn.silu(h2))

        h = h + h2

    res = nn.linear(params["post_dense"], h, precision)
    res = res.reshape(bs, cfg.n_joints, -1)
    if cfg.scale_by_sigma:
        res = res / used_sigmas.reshape(bs, 1, 1)
    return res


def classifier_free_apply(
    params, cfg, batch, t_labels, condition, w: float, **kwargs
) -> jax.Array:
    """Classifier-free guidance wrapper (model.py:48-65 ClassifierFreeSampler):
    out + w * (out - out_uncond)."""
    out = apply(params, cfg, batch, t_labels, condition, **kwargs)
    # null = the train-time dropout null (re-expressed cond zeroed), NOT raw
    # zero keypoints, which would re-express to cond = batch.xy (a strong
    # fake condition) and corrupt the guidance direction
    out_uncond = apply(params, cfg, batch, t_labels, condition,
                       force_null_condition=True, **kwargs)
    return out + w * (out - out_uncond)
