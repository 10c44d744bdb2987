"""Pose-estimation metrics: MPJPE, PA-MPJPE, PCK, AUC.

JAX equivalents of the reference's metric math (MPJPE inline in every
dataset's eval, e.g. h36m.py:296-309; PCK/AUC in
lib/algorithms/advanced/utils.py:814-849). All batched & jittable; the
multi-hypothesis min-reduction runs on device so only scalars cross back
to the host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.ops.procrustes import align_to_gt_batched


def per_joint_error(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Euclidean error per joint: [..., j, 3] -> [..., j]."""
    return jnp.sqrt(jnp.sum(jnp.square(pred - gt), axis=-1))


def mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean per-joint position error: [..., j, 3] -> [...] (mean over joints)."""
    return jnp.mean(per_joint_error(pred, gt), axis=-1)


def pa_mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE (protocol 2): [..., j, 3] -> [...]."""
    return mpjpe(align_to_gt_batched(pred, gt), gt)


def min_over_hypotheses(errors: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-sample (min error, argmin hypothesis) over axis 1 of [N, S] errors.

    The multi-hypothesis reduction of eval_multi (h36m.py:409-412).
    """
    return jnp.min(errors, axis=1), jnp.argmin(errors, axis=1)


def joint_errors_mm(gts, preds, scale: float = 1000.0, eval_joints=None):
    """[N, j] per-joint errors in mm — the shared input of PCK and AUC
    (computed once per eval instead of once per metric)."""
    err_mm = per_joint_error(jnp.asarray(preds), jnp.asarray(gts)) * scale
    if eval_joints is not None:
        err_mm = err_mm[:, jnp.asarray(eval_joints)]
    return err_mm


def pck_from_errors(err_mm, threshold: float = 150.0) -> float:
    """PCK at `threshold` mm from a precomputed [N, j] error matrix."""
    true_positive = int(jnp.sum((err_mm < threshold).astype(jnp.int32)))
    return float(true_positive / err_mm.size) * 100.0


def auc_from_errors(err_mm) -> float:
    """PCK-curve area (thresholds 0..150mm, 31 steps) from [N, j] errors."""
    thresholds = jnp.linspace(0.0, 150.0, 31)
    hits = jnp.sum(
        (err_mm[None, :, :] < thresholds[:, None, None]).astype(jnp.int32), axis=(1, 2)
    )
    pcks = np.asarray(hits, dtype=np.float64) / err_mm.size * 100.0
    return float(np.mean(pcks))


def compute_pck(
    gts: np.ndarray,
    preds: np.ndarray,
    scale: float = 1000.0,
    eval_joints=None,
    threshold: float = 150.0,
) -> float:
    """Percentage of Correct Keypoints at `threshold` mm (utils.py:814-836).

    gts/preds: [N, j, 3] in meters; `scale` converts to mm (the reference
    hard-codes 1000 inside the loop regardless of its `scales` arg —
    utils.py:829; we expose it but default identically).
    """
    return pck_from_errors(joint_errors_mm(gts, preds, scale, eval_joints),
                           threshold)


def compute_auc(
    gts: np.ndarray, preds: np.ndarray, scale: float = 1000.0, eval_joints=None
) -> float:
    """Area under the PCK curve for thresholds 0..150mm in 31 steps
    (utils.py:839-849, mimicking mpii_compute_3d_pck.m)."""
    return auc_from_errors(joint_errors_mm(gts, preds, scale, eval_joints))


def mean_cov(x: np.ndarray):
    """Mean + (degenerate identity) covariance (utils.py:851-863)."""
    x = np.asarray(x).reshape((x.shape[0], -1))
    m = np.mean(x, axis=0)
    cov = np.identity(m.shape[0])
    return m, cov


def mahalanobis(m=None, cov=None, x=None):
    """Identity-covariance Mahalanobis distances (utils.py:865-885).

    With cov forced to identity (as the reference does), this is squared
    euclidean distance to the mean; kept for API parity.
    """
    x = np.asarray(x)
    res = []
    for i in range(x.shape[0]):
        x_mu = x[i].reshape(x[i].shape[0], -1) - m
        mahal = x_mu @ x_mu.T
        res.append(mahal.diagonal())
    return np.array(res)
