"""Minimal functional NN primitives with torch-compatible parameter layout.

Parameters are plain nested dicts of jnp arrays whose keys/shapes mirror the
PyTorch state_dict of the reference models 1:1 (`weight` is [out, in]); this
makes checkpoint conversion a rename-free tree map and keeps the whole model a
pure function — the idiomatic shape for jit/vmap/pjit.

Initializers reproduce torch defaults (nn.Linear: kaiming-uniform(a=sqrt(5))
weights == U(-1/sqrt(fan_in), 1/sqrt(fan_in)), bias U(-1/sqrt(fan_in),
1/sqrt(fan_in)); nn.GroupNorm: ones/zeros) so that training-from-scratch has
the same statistics as the reference.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Params = dict


def init_linear(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "weight": jax.random.uniform(wkey, (out_dim, in_dim), dtype, -bound, bound),
        "bias": jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound),
    }


def linear(p: Params, x: jax.Array, precision=None) -> jax.Array:
    """x [..., in] @ W^T + b with W [out, in] (torch layout)."""
    return jnp.matmul(x, p["weight"].T, precision=precision) + p["bias"]


def init_group_norm(num_channels: int, dtype=jnp.float32) -> Params:
    return {
        "weight": jnp.ones((num_channels,), dtype),
        "bias": jnp.zeros((num_channels,), dtype),
    }


def group_norm(p: Params, x: jax.Array, num_groups: int, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over channel axis of [..., C] activations.

    torch.nn.GroupNorm semantics on 2D input [N, C]: normalize each group of
    C/num_groups channels per sample (biased variance), then per-channel
    affine. eps matches the torch default 1e-5.
    """
    *batch, c = x.shape
    g = num_groups
    xg = x.reshape(*batch, g, c // g)
    mean = jnp.mean(xg, axis=-1, keepdims=True)
    var = jnp.var(xg, axis=-1, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xg.reshape(*batch, c)
    return xn * p["weight"] + p["bias"]


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def dropout(
    x: jax.Array, rate: float, train: bool, rng: Optional[jax.Array]
) -> jax.Array:
    """Inverted dropout (torch semantics). Identity when train=False."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def zero_module(p: Params) -> Params:
    """Zero all tensors of a module's params — the reference's `zero_module`
    (lib/utils/generic.py:7) used by ControlNet-style zero bridges."""
    return jax.tree.map(jnp.zeros_like, p)
