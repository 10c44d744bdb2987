"""Small-matrix linear algebra in closed form, vectorized for the TPU VPU.

The reference leans on cuBLAS `torch.inverse` for batched 3x3 systems
(lib/algorithms/advanced/simple_zeroshot_opt.py:61,92). On TPU, LAPACK-style
factorizations of 3x3 matrices are a poor fit for the hardware; closed-form
adjugate/Cramer expressions are pure element-wise math that XLA fuses into the
surrounding program — no kernel launches, no dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def det3x3(m: jax.Array) -> jax.Array:
    """Determinant of [..., 3, 3] matrices."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adjugate3x3(m: jax.Array) -> jax.Array:
    """Adjugate (transposed cofactor matrix) of [..., 3, 3] matrices."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    adj = jnp.stack(
        [
            e * i - f * h, c * h - b * i, b * f - c * e,
            f * g - d * i, a * i - c * g, c * d - a * f,
            d * h - e * g, b * g - a * h, a * e - b * d,
        ],
        axis=-1,
    )
    return adj.reshape(m.shape)


def inv3x3(m: jax.Array) -> jax.Array:
    """Inverse of [..., 3, 3] matrices via adjugate/determinant."""
    return adjugate3x3(m) / det3x3(m)[..., None, None]


def solve3x3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve a @ x = b for [..., 3, 3] a and [..., 3] or [..., 3, k] b.

    HIGHEST precision: camera-translation solves are mm-level geometry and
    must not round through bf16 MXU inputs (CLAUDE.md numerics policy)."""
    inv = inv3x3(a)
    if b.ndim == a.ndim - 1:
        return jnp.einsum("...ij,...j->...i", inv, b,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(inv, b, precision=jax.lax.Precision.HIGHEST)


def inv_intrinsics(k: jax.Array) -> jax.Array:
    """Inverse of pinhole intrinsic matrices [..., 3, 3].

    K = [[fx, s, cx], [0, fy, cy], [0, 0, 1]]; closed-form inverse avoids the
    generic determinant expansion when the structure is known. Falls back on
    the general adjugate path because datasets occasionally carry skew or
    denormalized K (skiPose stores normalized intrinsics, skiPose.py:119-148).
    """
    return inv3x3(k)
