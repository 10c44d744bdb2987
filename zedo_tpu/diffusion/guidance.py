"""Guidance gradients for sampler steering.

Rebuild of the reference's guidance factories (lib/algorithms/advanced/
sampling.py:359-397 — defined for GFPose-style guided sampling, unused by the
shipped entry points). In JAX these are plain `jax.grad`s of differentiable
objectives — no enable_grad/detach dance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# H36M-convention limb pairs (sampling.py:382-386)
LEFT_PARENT = [12, 11, 8, 0, 4, 5]
LEFT_CHILD = [13, 12, 11, 4, 5, 6]
RIGHT_PARENT = [15, 14, 8, 0, 1, 2]
RIGHT_CHILD = [16, 15, 14, 1, 2, 3]


def get_match_grad_fn(weight: float = 1.0):
    """Gradient of the 2D-match loss sum ||x_xy - condition|| wrt x
    (sampling.py:359-371). Returns match_grad_fn(x, t, condition) -> [B, j, 3]
    with zero z-gradient."""

    def loss(x, condition):
        return jnp.sum(jnp.linalg.norm(x[..., :2] - condition, axis=-1))

    grad_fn = jax.grad(loss)

    def match_grad_fn(x, t, condition):
        del t
        return grad_fn(x, condition) * weight

    return match_grad_fn


def symmetry_loss(x: jax.Array, weight: float = 1.0) -> jax.Array:
    """Left/right limb-length asymmetry penalty (sampling.py:373-397).
    x: [B, j, 3]. The reference's `sym_grad_fn` returns this scalar (despite
    its name); both the scalar and its gradient are exposed here."""
    if x.shape[-2] < 17:
        # the limb tables are H36M-17; on 12-joint (infant) skeletons jit
        # gather would silently CLAMP indices >= j and score garbage pairs
        raise ValueError(
            f"symmetry guidance requires the 17-joint H36M skeleton "
            f"(got {x.shape[-2]} joints)"
        )
    left = jnp.linalg.norm(x[:, LEFT_PARENT, :] - x[:, LEFT_CHILD, :], axis=-1)
    right = jnp.linalg.norm(x[:, RIGHT_PARENT, :] - x[:, RIGHT_CHILD, :], axis=-1)
    return jnp.mean((left - right) ** 2) * weight


def get_sym_grad_fn(weight: float = 1.0):
    """Reference-parity factory: returns sym_grad_fn(x, t, condition) -> scalar
    (the reference returns the loss value, not a gradient — sampling.py:395)."""

    def sym_grad_fn(x, t, condition=None):
        del t, condition
        return symmetry_loss(x, weight)

    return sym_grad_fn


def get_sym_gradient_fn(weight: float = 1.0):
    """The evidently intended variant: actual gradient of the symmetry loss."""
    grad_fn = jax.grad(lambda x: symmetry_loss(x, weight))

    def sym_gradient_fn(x, t, condition=None):
        del t, condition
        return grad_fn(x)

    return sym_gradient_fn
