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


import functools


@functools.lru_cache(maxsize=16)
def _group_indicator_np(c: int, g: int, dtype_name: str):
    """[C, G] one-hot group membership / group size — the reduction matrix.
    Cached as NUMPY (a cached jnp array would leak tracers across jit scopes);
    jnp conversion at the call site is constant-folded by XLA."""
    import numpy as np

    m = np.zeros((c, g), dtype=dtype_name)
    size = c // g
    for i in range(g):
        m[i * size : (i + 1) * size, i] = 1.0 / size
    return m


def _group_indicator(c: int, g: int, dtype_name: str):
    return jnp.asarray(_group_indicator_np(c, g, dtype_name))


def group_norm(p: Params, x: jax.Array, num_groups: int, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over channel axis of [..., C] activations.

    torch.nn.GroupNorm semantics on 2D input [N, C]: normalize each group of
    C/num_groups contiguous channels per sample (biased variance), then
    per-channel affine. eps matches the torch default 1e-5.

    TPU note: the textbook reshape to [N, G, C/G] puts C/G (32) on the lane
    axis — a relayout + 4x lane-padding on every call, which dominated the
    OIL hot loop. Instead the group statistics are computed as MXU matmuls
    against a constant [C, G] group-indicator matrix and broadcast back with
    its transpose, keeping activations in their [N, C] layout throughout.
    """
    *batch, c = x.shape
    g = num_groups
    ind = _group_indicator(c, g, "float32")
    bcast = ind.T * (c // g)  # [G, C] ones at group members
    xf = x.astype(jnp.float32)
    mean_g = jnp.matmul(xf, ind, precision=jax.lax.Precision.HIGHEST)  # [..., G]
    mean_c = jnp.matmul(mean_g, bcast, precision=jax.lax.Precision.HIGHEST)
    centered = xf - mean_c
    # two-pass variance (E[(x-m)^2]): exact even for tiny groups, unlike
    # E[x^2]-m^2 which cancels catastrophically
    var_g = jnp.matmul(centered * centered, ind, precision=jax.lax.Precision.HIGHEST)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    rstd_c = jnp.matmul(rstd_g, bcast, precision=jax.lax.Precision.HIGHEST)
    xn = (centered * rstd_c).astype(x.dtype)
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
