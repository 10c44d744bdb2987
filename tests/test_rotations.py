"""Rotation math vs closed form and scipy (SURVEY.md §4 test pyramid, unit tier)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from zedo_tpu.ops import rotations as rot


def _random_rotmats(rng, n=64):
    return R.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_quaternion_to_matrix_vs_scipy(rng):
    q_scipy = R.random(128, random_state=rng).as_quat()  # xyzw
    q_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1).astype(np.float32)
    got = np.asarray(rot.quaternion_to_matrix(jnp.asarray(q_wxyz)))
    want = R.from_quat(q_scipy).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quaternion_to_matrix_nonunit(rng):
    """The IPO relies on non-unit quaternions being normalized internally."""
    q = rng.randn(32, 4).astype(np.float32) * 3.0
    got = np.asarray(rot.quaternion_to_matrix(jnp.asarray(q)))
    q_unit = q / np.linalg.norm(q, axis=-1, keepdims=True)
    want = np.asarray(rot.quaternion_to_matrix(jnp.asarray(q_unit)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # results are valid rotations
    eye = np.einsum("bij,bkj->bik", got, got)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)


def test_matrix_quaternion_roundtrip(rng):
    mats = _random_rotmats(rng)
    q = rot.matrix_to_quaternion(jnp.asarray(mats))
    back = np.asarray(rot.quaternion_to_matrix(q))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_euler_roundtrip(rng):
    mats = _random_rotmats(rng)
    for conv in ["XYZ", "ZYX", "XZY"]:
        ang = rot.matrix_to_euler_angles(jnp.asarray(mats), conv)
        back = np.asarray(rot.euler_angles_to_matrix(ang, conv))
        np.testing.assert_allclose(back, mats, atol=1e-4)


def test_euler_vs_scipy(rng):
    ang = (rng.rand(64, 3).astype(np.float32) - 0.5) * 2.0
    got = np.asarray(rot.euler_angles_to_matrix(jnp.asarray(ang), "XYZ"))
    # pytorch3d "XYZ" composes X(a) @ Y(b) @ Z(c) == scipy INTRINSIC "XYZ"
    want = R.from_euler("XYZ", ang).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    aa = rng.randn(64, 3).astype(np.float32)
    mats = rot.axis_angle_to_matrix(jnp.asarray(aa))
    back = np.asarray(rot.matrix_to_axis_angle(mats))
    want = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(np.asarray(mats), want, atol=1e-5)
    back_mats = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(back)))
    np.testing.assert_allclose(back_mats, want, atol=1e-4)


def test_rotation_6d_roundtrip(rng):
    mats = _random_rotmats(rng)
    d6 = rot.matrix_to_rotation_6d(jnp.asarray(mats))
    back = np.asarray(rot.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_random_rotations_valid():
    mats = np.asarray(rot.random_rotations(jax.random.PRNGKey(0), 100))
    eye = np.einsum("bij,bkj->bik", mats, mats)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(mats), 1.0, atol=1e-5)


def test_quaternion_to_matrix_grad():
    """IPO differentiates through quaternion_to_matrix; gradient must be finite."""
    def f(q):
        return jnp.sum(rot.quaternion_to_matrix(q) ** 2)

    g = jax.grad(f)(jnp.array([1.0, 0.1, -0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))
