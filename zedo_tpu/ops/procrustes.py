"""Procrustes alignment (protocol-2 / PA-MPJPE), batched for TPU.

JAX port of the MATLAB-style `procrustes` in lib/utils/transforms.py:42-127 and
`align_to_gt` (transforms.py:143-148). The reference aligns one 17x3 pose at a
time in a Python loop over N*S hypotheses (h36m.py:394-417); here the whole
[N, S] grid of 3x3 SVDs runs as a single vmapped, jitted program.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EXACT = jax.lax.Precision.HIGHEST


class ProcrustesResult(NamedTuple):
    d: jax.Array  # normalized residual
    z: jax.Array  # transformed B
    rotation: jax.Array  # [dim, dim]; Z = scale * B @ rotation + translation
    scale: jax.Array
    translation: jax.Array


def procrustes(
    a: jax.Array, b: jax.Array, scaling: bool = True, reflection: str | bool = "best"
) -> ProcrustesResult:
    """Least-squares similarity transform of `b` onto `a`.

    a, b: [n, dim] point sets (equal dims; the reference's dim_y < dim_x
    zero-padding branch is unreachable in all call sites and unsupported here).
    `scaling` / `reflection` are static Python values; per-sample reflection
    handling is arithmetic (no boolean indexing) so the function vmaps.
    """
    n, dim_x = a.shape
    assert b.shape[1] == dim_x, "dim_y < dim_x is not supported"

    a_bar = a.mean(axis=0)
    b_bar = b.mean(axis=0)
    a0 = a - a_bar
    b0 = b - b_bar

    ss_x = jnp.sum(a0**2)
    ss_y = jnp.sum(b0**2)
    a_norm = jnp.sqrt(ss_x)
    b_norm = jnp.sqrt(ss_y)
    a0 = a0 / a_norm
    b0 = b0 / b_norm

    m = jnp.matmul(a0.T, b0, precision=_EXACT)  # [dim, dim] cross-covariance
    u, s, vt = jnp.linalg.svd(m)
    v = vt.T
    r = jnp.matmul(v, u.T, precision=_EXACT)

    if reflection != "best":
        want_reflection = bool(reflection)
        have_reflection = jnp.linalg.det(r) < 0
        flip = have_reflection != want_reflection
        last_col_sign = jnp.where(flip, -1.0, 1.0).astype(a.dtype)
        col_signs = jnp.concatenate(
            [jnp.ones((dim_x - 1,), dtype=a.dtype), last_col_sign[None]]
        )
        v = v * col_signs[None, :]
        s = s * col_signs
        r = jnp.matmul(v, u.T, precision=_EXACT)

    s_trace = jnp.sum(s)
    if scaling:
        scale = s_trace * a_norm / b_norm
        d = 1 - s_trace**2
        z = a_norm * s_trace * jnp.matmul(b0, r, precision=_EXACT) + a_bar
    else:
        scale = jnp.ones((), dtype=a.dtype)
        d = 1 + ss_y / ss_x - 2 * s_trace * b_norm / a_norm
        z = b_norm * jnp.matmul(b0, r, precision=_EXACT) + a_bar

    translation = a_bar - scale * jnp.matmul(b_bar, r, precision=_EXACT)
    return ProcrustesResult(d=d, z=z, rotation=r, scale=scale, translation=translation)


def align_to_gt(pose: jax.Array, pose_gt: jax.Array) -> jax.Array:
    """Procrustes-align `pose` [j, 3] to `pose_gt` [j, 3] (transforms.py:143-148)."""
    return procrustes(pose_gt, pose).z


@functools.partial(jax.jit, static_argnames=())
def align_to_gt_batched(poses: jax.Array, poses_gt: jax.Array) -> jax.Array:
    """Vmapped alignment over arbitrary leading batch dims.

    poses: [..., j, 3], poses_gt: [..., j, 3] -> aligned poses [..., j, 3].
    Replaces the reference's per-(sample, hypothesis) Python loop
    (h36m.py:399-407) with one fused program of batched 3x3 SVDs.
    """
    batch_shape = poses.shape[:-2]
    j, d = poses.shape[-2:]
    flat = poses.reshape((-1, j, d))
    flat_gt = poses_gt.reshape((-1, j, d))
    aligned = jax.vmap(align_to_gt)(flat, flat_gt)
    return aligned.reshape(batch_shape + (j, d))
