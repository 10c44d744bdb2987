"""Init Pose Optimization (IPO): fit a global rotation + translation scale so
the cluster init pose reprojects onto the observed 2D keypoints.

Rebuild of `RotOpt` + its driver loop (simple_zeroshot_opt.py:8-31,
run/opt_main.py:177-201) as one `lax.scan` of optax.adam steps — the reference
runs 500 Python-loop Adam steps through torch autograd; here the whole fit is
a single differentiable XLA program (vmappable over hypotheses, pjittable over
the batch).

Parameterization parity: a per-sample quaternion whose real part starts at 1
and whose imaginary parts exist ONLY for the axes named in `rot_axes`
(config.ZeDO.RotAxes) — absent axes are structurally zero, exactly like the
reference's conditional nn.Parameters — plus a translation scale clamped to
[min_scale_t, max_scale_t] in the forward pass (clamp => zero gradient outside
bounds, same as torch.clamp). Loss is mean L1 on the projected xy of the
`keypoint_list` joints; Adam(lr=0.1, betas=(0.9, 0.999), eps=1e-8) matches
torch defaults (opt_main.py:184).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


from zedo_tpu.ops.linalg import inv_intrinsics
from zedo_tpu.ops.rotations import quaternion_to_matrix

_EXACT = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class IPOConfig:
    """Mirrors the config.ZeDO IPO_* keys (configs/optim/*.py:72-77)."""

    iterations: int = 500
    keypoint_list: tuple = (0, 1, 4)
    rot_axes: str = "z"
    t_norm: float = 3.0  # IPO_T
    min_scale_t: float = 0.5
    max_scale_t: float = 2.0
    lr: float = 0.1


class IPOResult(NamedTuple):
    rot_mat: jax.Array  # [B, 3, 3]
    translation: jax.Array  # [B, 1, 3] — T * clamp(scale)
    quaternion: jax.Array  # [B, 4]
    scale: jax.Array  # [B, 1, 1] raw (unclamped) learned scale
    loss: jax.Array  # final L1 loss (diagnostic)


def init_translation(cond2d: jax.Array, k: jax.Array, t_norm: float,
                     pelvis: jax.Array | None = None) -> jax.Array:
    """Pelvis back-projection scaled to ||T|| = t_norm (opt_main.py:177-179).

    cond2d: [B, j, >=2] 2D keypoints (joint 0 = pelvis); k: [B, 3, 3];
    pelvis: optional [B, 2] override of the pelvis pixel (the infant pipeline
    uses mean(hips) for the syrip convention — zeroshot/infant.pelvis_2d).
    Returns [B, 1, 3].
    """
    if pelvis is None:
        pelvis = cond2d[:, 0, :2]
    hom = jnp.concatenate([pelvis, jnp.ones_like(pelvis[:, :1])], axis=-1)
    t = jnp.einsum("bij,bj->bi", inv_intrinsics(k), hom, precision=_EXACT)
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True) * t_norm
    return t[:, None, :]


def _quaternion(params: dict, batch: int, rot_axes: str) -> jax.Array:
    """Assemble [B, 4] wxyz quaternions; non-learned axes are constant zero
    (simple_zeroshot_opt.py:27-31)."""
    zeros = jnp.zeros((batch, 1), params["rot_vect"].dtype)
    comps = [params["rot_vect"]]
    for axe in "xyz":
        comps.append(params[f"rot_vect_{axe}"] if axe in rot_axes else zeros)
    return jnp.concatenate(comps, axis=-1)


def _quat_rotate(quat: jax.Array, pose: jax.Array) -> jax.Array:
    """Rotate [B, n, 3] points by [B, 4] (non-unit) quaternions directly:
    p' = p + (2/|q|^2) (w (v x p) + v x (v x p)) — identical to
    quaternion_to_matrix + batched 3x3 matmul, but pure elementwise VPU math
    (the tiny batched matmuls dominated the 500-step IPO scan on TPU)."""
    w = quat[:, 0][:, None, None]
    v = quat[:, None, 1:]
    s = (2.0 / jnp.sum(quat * quat, axis=-1))[:, None, None]
    vxp = jnp.cross(v, pose)
    return pose + s * (w * vxp + jnp.cross(v, vxp))


def _project_pose(quat, scale, pose, t, k, cfg: IPOConfig):
    """RotOpt.forward (simple_zeroshot_opt.py:20-25): rotate, translate by
    T * clamp(scale), pinhole-project. Broadcast-form projection instead of
    batched K matmuls (same TPU reasoning as _quat_rotate)."""
    x = _quat_rotate(quat, pose)
    x = x + t * jnp.clip(scale, cfg.min_scale_t, cfg.max_scale_t)
    px = jnp.sum(x * k[:, None, 0, :], axis=-1)
    py = jnp.sum(x * k[:, None, 1, :], axis=-1)
    pz = jnp.sum(x * k[:, None, 2, :], axis=-1)
    return jnp.stack([px / pz, py / pz], axis=-1)


def run_ipo(
    pose: jax.Array,
    cond2d: jax.Array,
    k: jax.Array,
    cfg: IPOConfig,
    t: jax.Array | None = None,
) -> IPOResult:
    """Fit rotation + translation scale (opt_main.py:180-201).

    pose: [B, j, 3] root-relative init pose (the broadcast cluster pose);
    cond2d: [B, j, >=2] observed 2D keypoints; k: [B, 3, 3] intrinsics;
    t: optional [B, 1, 3] initial translation (defaults to the pelvis ray).

    Returns rotation matrices and the scaled translation
    (T * clamp(scale, min, max), opt_main.py:194).
    """
    batch = pose.shape[0]
    keylist = jnp.asarray(cfg.keypoint_list)
    pose_sel = pose[:, keylist, :]
    target = cond2d[:, keylist, :2]
    if t is None:
        t = init_translation(cond2d, k, cfg.t_norm)

    params = {
        "rot_vect": jnp.ones((batch, 1)),
        "scale": jnp.ones((batch, 1, 1)),
    }
    for axe in cfg.rot_axes:
        params[f"rot_vect_{axe}"] = jnp.zeros((batch, 1))

    optimizer = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(params)

    def loss_fn(p):
        quat = _quaternion(p, batch, cfg.rot_axes)
        px = _project_pose(quat, p["scale"], pose_sel, t, k, cfg)
        return jnp.mean(jnp.abs(px - target))

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt_state), None, length=cfg.iterations
    )

    quat = _quaternion(params, batch, cfg.rot_axes)
    scale = params["scale"]
    return IPOResult(
        rot_mat=quaternion_to_matrix(quat),
        translation=t * jnp.clip(scale, cfg.min_scale_t, cfg.max_scale_t),
        quaternion=quat,
        scale=scale,
        loss=losses[-1],
    )
