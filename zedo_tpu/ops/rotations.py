"""Rotation representation conversions (quaternion / matrix / euler / axis-angle / 6D).

JAX re-implementation of the rotation suite the reference vendors from PyTorch3D
(reference: lib/algorithms/advanced/utils.py:59-628). All functions are pure,
batched over arbitrary leading dimensions, and jit/vmap/grad-safe on TPU
(no data-dependent control flow; `where`-based selection instead of boolean
indexing).

Matrices act on column vectors: `p' = R @ p`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """Convert real-part-first quaternions [..., 4] to rotation matrices [..., 3, 3].

    Handles non-unit quaternions via the `2/|q|^2` normalization, matching the
    reference exactly (utils.py:59-88) — the IPO optimizer relies on this since
    its learnable quaternions are never explicitly normalized.
    """
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _copysign(a: jax.Array, b: jax.Array) -> jax.Array:
    """|a| with the sign of b (reference utils.py:90-105; ignores -0/NaN)."""
    signs_differ = (a < 0) != (b < 0)
    return jnp.where(signs_differ, -a, a)


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a zero subgradient at x == 0 (utils.py:108-116)."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Rotation matrices [..., 3, 3] -> real-part-first quaternions [..., 4].

    Best-conditioned-candidate selection as in the reference (utils.py:119-178),
    implemented with one-hot selection instead of boolean indexing so it stays
    jittable.
    """
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # [..., 4, 4]

    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], 0.1))

    best = jnp.argmax(q_abs, axis=-1)  # [...]
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)  # [..., 4]
    return jnp.sum(quat_candidates * onehot[..., None], axis=-2)


def _axis_angle_rotation(axis: str, angle: jax.Array) -> jax.Array:
    """Single-axis rotation matrices (utils.py:182-209)."""
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)

    if axis == "X":
        r_flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        r_flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        r_flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("letter must be either X, Y or Z.")

    return jnp.stack(r_flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jax.Array, convention: str) -> jax.Array:
    """Euler angles (radians) [..., 3] -> rotation matrices (utils.py:212-238)."""
    if euler_angles.ndim == 0 or euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")
    matrices = [
        _axis_angle_rotation(c, e)
        for c, e in zip(convention, jnp.moveaxis(euler_angles, -1, 0))
    ]
    # HIGHEST: rotation composition is geometry (repo numerics policy);
    # default TPU matmul would round the entries through bf16
    exact = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(matrices[0], matrices[1], precision=exact),
                      matrices[2], precision=exact)


def _angle_from_tan(
    axis: str, other_axis: str, data: jax.Array, horizontal: bool, tait_bryan: bool
) -> jax.Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def _index_from_letter(letter: str) -> int:
    return {"X": 0, "Y": 1, "Z": 2}[letter]


def matrix_to_euler_angles(matrix: jax.Array, convention: str) -> jax.Array:
    """Rotation matrices -> Euler angles (radians) [..., 3] (utils.py:285-324)."""
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central_angle = jnp.arcsin(
            matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0)
        )
    else:
        central_angle = jnp.arccos(matrix[..., i0, i0])

    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central_angle,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Random unit quaternions with nonnegative real part [n, 4] (utils.py:328-349)."""
    o = jax.random.normal(key, (n, 4), dtype=dtype)
    s = jnp.sum(o * o, axis=1)
    return o / _copysign(jnp.sqrt(s), o[:, 0])[:, None]


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Random rotation matrices [n, 3, 3] (utils.py:353-...)."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype=dtype))


def standardize_quaternion(quaternions: jax.Array) -> jax.Array:
    """Force nonnegative real part (pytorch3d convention)."""
    return jnp.where(quaternions[..., 0:1] < 0, -quaternions, quaternions)


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3]."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    """Rotation matrices -> axis-angle [..., 3]."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> quaternion [..., 4], small-angle Taylor safe."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half_angles = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x: Taylor 0.5 - x^2/48 near zero
    safe_angles = jnp.where(small, 1.0, angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half_angles) / safe_angles
    )
    return jnp.concatenate(
        [jnp.cos(half_angles), axis_angle * sin_half_over_angle], axis=-1
    )


def quaternion_to_axis_angle(quaternions: jax.Array) -> jax.Array:
    """Quaternion [..., 4] -> axis-angle [..., 3], small-angle Taylor safe."""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_half = jnp.where(small, 1.0, half_angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(safe_half) / jnp.where(small, 1.0, angles)
    )
    return quaternions[..., 1:] / sin_half_over_angle


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6D rotation representation [..., 6] -> matrices (Zhou et al. CVPR'19)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """Matrices [..., 3, 3] -> 6D representation (first two rows) [..., 6]."""
    batch_dim = matrix.shape[:-2]
    return matrix[..., :2, :].reshape(batch_dim + (6,))
