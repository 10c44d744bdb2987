"""Camera-frame transforms and pinhole projection.

JAX equivalents of lib/utils/transforms.py:5-140 plus the batched projection /
back-projection primitives the zero-shot optimizer uses. Everything is pure,
batched, and differentiable (the IPO loss backprops through `project`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from zedo_tpu.ops.linalg import inv_intrinsics

# Geometry is mm-accuracy-critical and tiny; never let the MXU downcast it.
# (TPU matmul defaults to bf16 inputs — a ~3-pixel error on 1000px cameras.)
_EXACT = jax.lax.Precision.HIGHEST


def world_to_camera_frame(p: jax.Array, r: jax.Array, t: jax.Array) -> jax.Array:
    """Points [N, 3] world -> camera: R @ (P^T - T) (transforms.py:5-22)."""
    return jnp.matmul(r, p.T - t, precision=_EXACT).T


def camera_to_world_frame(p: jax.Array, r: jax.Array, t: jax.Array) -> jax.Array:
    """Points [N, 3] camera -> world: R^T @ P^T + T (transforms.py:24-40)."""
    return (jnp.matmul(r.T, p.T, precision=_EXACT) + t).T


def image_to_camera_frame(
    pose3d_image_frame: jax.Array,
    box: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    root_depth: jax.Array,
) -> jax.Array:
    """Image-frame (pixel + relative depth) pose -> camera frame.

    Port of transforms.py:129-140 with intrinsics as scalars instead of a dict
    so it vmaps. `box` is [4] (x1, y1, x2, y2); depth decoded against a
    2000-unit canonical box.
    """
    rectangle_3d_size = 2000.0
    ratio = (box[2] - box[0] + 1) / rectangle_3d_size
    z = pose3d_image_frame[:, 2] / ratio + root_depth
    x = (pose3d_image_frame[:, 0] - cx) / fx * z
    y = (pose3d_image_frame[:, 1] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


def project(points3d: jax.Array, k: jax.Array) -> jax.Array:
    """Pinhole projection: [..., j, 3] points, [..., 3, 3] K -> [..., j, 2] pixels.

    Matches RotOpt.forward's projection (simple_zeroshot_opt.py:22-24):
    perspective divide by z after applying K.
    """
    proj = jnp.einsum("...ij,...nj->...ni", k, points3d, precision=_EXACT)
    return proj[..., :2] / proj[..., 2:]


def backproject_rays(points2d: jax.Array, k: jax.Array) -> jax.Array:
    """Back-project pixels to z=1 camera rays.

    [..., j, 2] pixels, [..., 3, 3] K -> [..., j, 3] rays with ray_z == 1,
    matching gradient_field_gen's `ray2d / ray2d[..., 2:]`
    (simple_zeroshot_opt.py:61-71).
    """
    kinv = inv_intrinsics(k)
    ones = jnp.ones(points2d.shape[:-1] + (1,), dtype=points2d.dtype)
    hom = jnp.concatenate([points2d, ones], axis=-1)
    rays = jnp.einsum("...ij,...nj->...ni", kinv, hom, precision=_EXACT)
    return rays / rays[..., 2:]
