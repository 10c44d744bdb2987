"""Exponential moving average of a params pytree.

Rebuild of lib/algorithms/ema.py as pure functions over an EMAState pytree
(no in-place mutation, no store/restore dance — swapping params is just using
a different pytree). `num_updates` warmup matches ema.py:44-46:
decay_eff = min(decay, (1 + n) / (10 + n)).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    decay: jax.Array  # scalar f32
    num_updates: jax.Array  # scalar i32; < 0 disables warmup (use_num_updates=False)
    shadow_params: dict


def init(params, decay: float = 0.999, use_num_updates: bool = True) -> EMAState:
    if decay < 0.0 or decay > 1.0:
        raise ValueError("Decay must be between 0 and 1")
    return EMAState(
        decay=jnp.asarray(decay, jnp.float32),
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
        shadow_params=jax.tree.map(jnp.asarray, params),
    )


def update(state: EMAState, params) -> EMAState:
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    decay = jnp.where(
        n >= 0,
        jnp.minimum(state.decay, (1.0 + n) / (10.0 + n)),
        state.decay,
    )
    one_minus = 1.0 - decay
    # keep each shadow leaf's dtype (a strong-f32 one_minus would silently
    # promote bf16 shadows to f32 on the first update)
    shadow = jax.tree.map(
        lambda s, p: (s - one_minus.astype(s.dtype) * (s - p)).astype(s.dtype),
        state.shadow_params, params
    )
    return EMAState(decay=state.decay, num_updates=n, shadow_params=shadow)


def params_of(state: EMAState):
    """The EMA weights (the reference's copy_to, minus the mutation)."""
    return state.shadow_params
