"""ScoreMLP: the pose-prior denoiser (reference `ScoreModelFC_Adv`).

A residual MLP over flattened poses [B, j*d] with time-conditioned blocks
(lib/algorithms/advanced/model.py:97-298). This rebuild is a pure function of
a params pytree whose structure matches the torch state_dict (see
utils/checkpoint.py for the converter), plus a static `ScoreMLPConfig`.

Architecture (model.py:264-291, dims from run/opt_main.py:33-37):
    h  = pre_dense(x) + pre_dense_t(temb); GN(32); SiLU; Dropout(0.25)
    2 x residual block:
        h1 = act(GN(dense1(h)  + dense1_t(temb))); drop
        h2 = act(GN(dense2(h1) + dense2_t(temb))); drop
        h  = h + h2
    out = post_dense(h) -> [B, j, d]
Time embedding: GaussianFourier(log t) for 'fourier' or sinusoidal positional
for 'positional' (eval configs use positional — configs/optim/*.py:64), then a
shared Linear+SiLU (model.py:128-131). Conditioning inputs are accepted but
ignored — the reference model is unconditional (model.py:215-240, all cond
paths commented out).

TPU notes: the hot path is 9 [B,1024]x[1024,1024]-class matmuls — pure MXU
work. `precision`/`param_dtype` knobs select fp32 (bit-parity with published
checkpoints) or bf16 (faster). The time embedding depends only on t, so
callers inside the OIL scan precompute it per step via `time_embedding()` +
`apply_with_temb()` and carry it as scan xs instead of recomputing sin/cos
per batch element.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.models import nn

Params = dict


@dataclasses.dataclass(frozen=True)
class ScoreMLPConfig:
    n_joints: int = 17
    joint_dim: int = 3
    hidden_dim: int = 1024
    embed_dim: int = 512
    cond_dim: int = 3  # accepted for API parity; conditioning is dead in ref
    n_blocks: int = 2
    embedding_type: str = "positional"  # 'fourier' | 'positional'
    fourier_scale: float = 16.0  # configs/optim/*.py:45 `model.fourier_scale`
    scale_by_sigma: bool = False
    dropout: float = 0.25
    # sigmas buffer bounds (model.py:132 register_buffer('sigmas', get_sigmas))
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000
    group_norm_groups: int = 32

    def __post_init__(self):
        # GroupNorm with 1 channel per group is degenerate: (x - x)/sqrt(0+
        # eps) = 0, so every activation collapses to its bias and the whole
        # network output becomes INPUT-INDEPENDENT (torch GroupNorm behaves
        # identically, so the reference would too). Refuse loudly — this
        # bit a hidden_dim=32 test model and produced batch-independent
        # training losses with no other symptom.
        if self.hidden_dim < 2 * self.group_norm_groups:
            raise ValueError(
                f"hidden_dim={self.hidden_dim} with group_norm_groups="
                f"{self.group_norm_groups} gives GroupNorm groups of "
                f"{self.hidden_dim // self.group_norm_groups} channel(s); "
                f"size-1 groups normalize every activation to its bias, "
                f"making the network constant in its input — widen "
                f"hidden_dim or lower group_norm_groups")
        if self.hidden_dim % self.group_norm_groups:
            raise ValueError(
                f"hidden_dim={self.hidden_dim} not divisible by "
                f"group_norm_groups={self.group_norm_groups}")


def get_sigmas(cfg: ScoreMLPConfig) -> np.ndarray:
    """Geometric sigma ladder (model.py:68-78)."""
    return np.exp(
        np.linspace(math.log(cfg.sigma_max), math.log(cfg.sigma_min), cfg.num_scales)
    )


def gaussian_fourier_projection(w: jax.Array, x: jax.Array) -> jax.Array:
    """Random-feature time encoding (model.py:27-36): x [B] -> [B, 2*|w|]."""
    x_proj = x[:, None] * w[None, :] * 2 * math.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def get_timestep_embedding(
    timesteps: jax.Array, embedding_dim: int, max_positions: int = 10000
) -> jax.Array:
    """Sinusoidal positional embedding for continuous timesteps [B]
    (model.py:81-95). ZeDO feeds labels = t*999 as floats."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def init_params(key: jax.Array, cfg: ScoreMLPConfig, dtype=jnp.float32) -> Params:
    """Build the params pytree; keys mirror the torch state_dict names."""
    keys = iter(jax.random.split(key, 32))
    h, e, io = cfg.hidden_dim, cfg.embed_dim, cfg.n_joints * cfg.joint_dim
    p: Params = {
        "pre_dense": nn.init_linear(next(keys), io, h, dtype),
        "pre_dense_t": nn.init_linear(next(keys), e, h, dtype),
        "pre_gnorm": nn.init_group_norm(h, dtype),
        # nn.Sequential(Linear, SiLU) -> key 'shared_time_embed.0'
        "shared_time_embed": {"0": nn.init_linear(next(keys), e, e, dtype)},
        "post_dense": nn.init_linear(next(keys), h, io, dtype),
        "sigmas": jnp.asarray(get_sigmas(cfg), dtype),  # buffer
    }
    if cfg.embedding_type == "fourier":
        # fixed (non-trainable) random projection, scale from config
        p["gauss_proj"] = {
            "W": jax.random.normal(next(keys), (e // 2,), dtype) * cfg.fourier_scale
        }
    for idx in range(cfg.n_blocks):
        p[f"b{idx + 1}_dense1"] = nn.init_linear(next(keys), h, h, dtype)
        p[f"b{idx + 1}_dense1_t"] = nn.init_linear(next(keys), e, h, dtype)
        p[f"b{idx + 1}_gnorm1"] = nn.init_group_norm(h, dtype)
        p[f"b{idx + 1}_dense2"] = nn.init_linear(next(keys), h, h, dtype)
        p[f"b{idx + 1}_dense2_t"] = nn.init_linear(next(keys), e, h, dtype)
        p[f"b{idx + 1}_gnorm2"] = nn.init_group_norm(h, dtype)
    return p


def time_embedding(params: Params, cfg: ScoreMLPConfig, t_labels: jax.Array) -> jax.Array:
    """Shared time embedding [B] -> [B, embed_dim] (model.py:247-259).

    t_labels are the model-facing labels (t*999 for continuous sub-VP —
    utils.py:762). Split out from `apply` so the OIL scan can precompute one
    embedding per timestep instead of per (step x batch)."""
    if cfg.embedding_type == "fourier":
        temb = gaussian_fourier_projection(params["gauss_proj"]["W"], jnp.log(t_labels))
    elif cfg.embedding_type == "positional":
        temb = get_timestep_embedding(t_labels, cfg.embed_dim)
    else:
        raise ValueError(f"time embedding type {cfg.embedding_type} unknown.")
    return nn.silu(nn.linear(params["shared_time_embed"]["0"], temb))


def apply_with_temb(
    params: Params,
    cfg: ScoreMLPConfig,
    batch: jax.Array,
    temb: jax.Array,
    *,
    used_sigmas: Optional[jax.Array] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    precision=None,
    intermediates: Optional[dict] = None,
) -> jax.Array:
    """Trunk forward given a precomputed shared time embedding.

    batch: [B, j, d]; temb: [B, embed] or [embed] (broadcast over batch).
    intermediates: optional dict filled with named per-layer activations
    (eager diagnostic/parity use only — under jit it would collect tracers).
    """
    bs = batch.shape[0]
    x = batch.reshape(bs, -1)
    if temb.ndim == 1:
        temb = jnp.broadcast_to(temb, (bs, temb.shape[0]))

    drop_keys = iter(jax.random.split(rng, 1 + 2 * cfg.n_blocks)) if train else iter([])

    def drop(v):
        return nn.dropout(v, cfg.dropout, train, next(drop_keys) if train else None)

    def rec(name, v):
        if intermediates is not None:
            intermediates[name] = v

    g = cfg.group_norm_groups
    h = nn.linear(params["pre_dense"], x, precision)
    h = h + nn.linear(params["pre_dense_t"], temb, precision)
    h = nn.group_norm(params["pre_gnorm"], h, g)
    rec("pre_gnorm", h)
    h = nn.silu(h)
    h = drop(h)

    for idx in range(cfg.n_blocks):
        h1 = nn.linear(params[f"b{idx + 1}_dense1"], h, precision)
        h1 = h1 + nn.linear(params[f"b{idx + 1}_dense1_t"], temb, precision)
        h1 = nn.group_norm(params[f"b{idx + 1}_gnorm1"], h1, g)
        rec(f"b{idx + 1}_gnorm1", h1)
        h1 = nn.silu(h1)
        h1 = drop(h1)

        h2 = nn.linear(params[f"b{idx + 1}_dense2"], h1, precision)
        h2 = h2 + nn.linear(params[f"b{idx + 1}_dense2_t"], temb, precision)
        h2 = nn.group_norm(params[f"b{idx + 1}_gnorm2"], h2, g)
        rec(f"b{idx + 1}_gnorm2", h2)
        h2 = nn.silu(h2)
        h2 = drop(h2)

        h = h + h2

    res = nn.linear(params["post_dense"], h, precision)
    res = res.reshape(bs, cfg.n_joints, -1)

    if cfg.scale_by_sigma:
        res = res / used_sigmas.reshape(bs, 1, 1)
    return res


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
    intermediates: Optional[dict] = None,
) -> jax.Array:
    """Full forward (model.py:215-297). condition/mask are accepted and
    ignored, as in the reference's unconditional model."""
    del condition, mask
    if cfg.embedding_type == "fourier":
        used_sigmas = t_labels
    else:
        used_sigmas = params["sigmas"][t_labels.astype(jnp.int32)]
    temb = time_embedding(params, cfg, t_labels)
    if intermediates is not None:
        intermediates["temb"] = temb
    return apply_with_temb(
        params, cfg, batch, temb,
        used_sigmas=used_sigmas, train=train, rng=rng, precision=precision,
        intermediates=intermediates,
    )
