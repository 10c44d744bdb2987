"""Multi-hypothesis pose evaluation, batched on device.

Rebuild of the eval_multi machinery copy-pasted across every reference
dataset (h36m.py:365-442, pw3d.py:286-345, mpii3dHP.py:424-583,
skiPose.py:159-205, mini_rgbd.py:307-370, syrip.py:317-366). The reference
aligns and scores one (sample, hypothesis) pair at a time in nested Python
loops; here the whole [N, S] error matrix — including protocol-2 Procrustes
alignment (batched 3x3 SVDs) — is one jitted program, and only the reduced
scalars return to the host for the action-wise report.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.ops.metrics import (
    auc_from_errors, joint_errors_mm, min_over_hypotheses, mpjpe,
    pck_from_errors,
)
from zedo_tpu.ops.procrustes import align_to_gt_batched
from zedo_tpu.utils.table import Table


@dataclasses.dataclass
class EvalReport:
    error: float  # the headline metric (action-wise or plain mean of per-sample min)
    per_sample_min: np.ndarray  # [N]
    min_hypothesis: np.ndarray  # [N] argmin hypothesis index
    per_action: Optional[dict] = None  # action id -> mean error
    pck: Optional[float] = None
    auc: Optional[float] = None
    hypo_std: Optional[tuple] = None  # per-axis hypothesis std (x, y, z)


def _hypothesis_errors(preds, gt, protocol2: bool, joint_subset, subset_before_align):
    """[N, S, j, 3] preds vs [N, j, 3] gt -> [N, S] mean per-joint errors."""
    gt_b = jnp.broadcast_to(gt[:, None], preds.shape)
    if joint_subset is not None and subset_before_align:
        idx = jnp.asarray(joint_subset)
        preds = preds[:, :, idx, :]
        gt_b = gt_b[:, :, idx, :]
    if protocol2:
        preds = align_to_gt_batched(preds, gt_b)
    if joint_subset is not None and not subset_before_align:
        idx = jnp.asarray(joint_subset)
        preds = preds[:, :, idx, :]
        gt_b = gt_b[:, :, idx, :]
    return mpjpe(preds, gt_b)


_hypothesis_errors_jit = jax.jit(
    _hypothesis_errors,
    static_argnames=("protocol2", "joint_subset", "subset_before_align"),
)


def multi_hypothesis_eval(
    preds: np.ndarray,
    gt: np.ndarray,
    protocol2: bool = False,
    actions: Optional[np.ndarray] = None,
    action_order: Optional[Sequence[int]] = None,
    joint_subset=None,
    subset_before_align: bool = True,
    with_pck_auc: bool = False,
    with_hypo_std: bool = False,
    valid_ind=None,
) -> EvalReport:
    """Score [N, S, j, 3] hypotheses against [N, j, 3] GT.

    * per-sample error = min over hypotheses of mean per-joint error
      (h36m.py:409-412);
    * headline = mean over action groups of per-action means when `actions`
      given (h36m.py:424-433), else plain mean (pw3d.py:338);
    * `joint_subset` restricts scored joints (3DPW J=14, mini 12->7);
      `subset_before_align` controls whether alignment sees the subset
      (mini, mini_rgbd.py:339-343) or the full pose (3DPW evident intent,
      pw3d.py:318-327);
    * PCK/AUC computed on the min-error hypotheses (mpii3dHP.py:480-483).
    """
    preds = jnp.asarray(preds)
    gt = jnp.asarray(gt)
    errors = _hypothesis_errors_jit(
        preds, gt, protocol2, tuple(joint_subset) if joint_subset is not None else None,
        subset_before_align,
    )
    if valid_ind is not None:
        # per-sample hypothesis filtering (the reference's
        # `if sec_idx not in valid_ind[idx]: continue` — skiPose.py /
        # mini_rgbd.py / syrip.py eval_multi): invalid hypotheses never win
        # the min. Accepts an [N, S] boolean mask or a per-sample iterable
        # of valid hypothesis indices.
        n, s = errors.shape
        vi = valid_ind
        if isinstance(vi, np.ndarray) and vi.dtype == bool and vi.shape == (n, s):
            mask = np.asarray(vi)
        else:
            rows = [np.asarray(list(vi[i])) for i in range(n)]
            if any(r.dtype == np.bool_ for r in rows):
                # boolean rows are per-sample MASKS, never index lists:
                # casting True/False to indices 1/0 would silently mark the
                # wrong hypotheses valid (advisor r4)
                if not all(r.dtype == np.bool_ and r.shape == (s,) for r in rows):
                    raise ValueError(
                        "valid_ind mixes boolean mask rows with index rows "
                        f"(or a mask row is not length S={s}); supply either "
                        "an [N, S] boolean mask or per-sample index lists")
                mask = np.stack(rows)
            else:
                # vectorized scatter of the ragged index lists
                mask = np.zeros((n, s), bool)
                lens = np.fromiter((len(r) for r in rows), dtype=np.int64,
                                   count=n)
                if lens.sum():
                    flat = np.concatenate([r for r in rows if len(r)])
                    if not np.issubdtype(flat.dtype, np.integer):
                        fi = flat.astype(np.int64)
                        if not np.array_equal(fi, flat):
                            raise ValueError(
                                "valid_ind index rows must be integers")
                        flat = fi
                    mask[np.repeat(np.arange(n), lens), flat] = True
        if not mask.any(axis=1).all():
            raise ValueError("valid_ind leaves some sample with no valid "
                             "hypothesis")
        errors = jnp.where(jnp.asarray(mask), errors, jnp.inf)
    min_err, min_arg = min_over_hypotheses(errors)
    per_sample_min = np.asarray(min_err)
    min_idx = np.asarray(min_arg)

    per_action = None
    if actions is not None:
        actions = np.asarray(actions)
        order = action_order if action_order is not None else sorted(set(actions.tolist()))
        per_action = {}
        means = []
        for a in order:
            sel = per_sample_min[actions == a]
            if len(sel):
                per_action[a] = float(np.mean(sel))
                means.append(per_action[a])
        if not means:
            raise ValueError(
                f"no samples fall into any action of action_order="
                f"{list(order)} (got actions {sorted(set(actions.tolist()))})")
        error = float(np.mean(means))
    else:
        error = float(np.mean(per_sample_min))

    pck = auc = None
    if with_pck_auc:
        min_preds = np.asarray(
            jnp.take_along_axis(preds, jnp.asarray(min_idx)[:, None, None, None], axis=1)
        )[:, 0]
        # one shared per-joint error matrix feeds both metrics
        err_mm = joint_errors_mm(np.asarray(gt), min_preds)
        pck = pck_from_errors(err_mm)
        auc = auc_from_errors(err_mm)

    # per-axis hypothesis diversity, root-relative, excluding root
    # (mpii3dHP.py:487-490); only the 3DHP GT branch reads it — computed on
    # demand so the other datasets' full-split evals don't materialize the
    # [N, S, j-1, 3] temporaries for a discarded field
    hypo_std = None
    if with_hypo_std:
        rel = preds - preds[:, :, 0:1, :]
        rel = rel[:, :, 1:, :]
        hypo_std = tuple(
            float(jnp.mean(jnp.std(rel[..., ax], axis=1))) for ax in range(3)
        )

    return EvalReport(
        error=error,
        per_sample_min=per_sample_min,
        min_hypothesis=min_idx,
        per_action=per_action,
        pck=pck,
        auc=auc,
        hypo_std=hypo_std,
    )


def gt_from_items(items) -> np.ndarray:
    """h36m-format pkl items -> root-centered GT in meters [N, j, 3]
    (h36m.py:292-293; the one normalization every dataset eval shares)."""
    gt = np.array([i["joint_3d_camera"] for i in items], dtype=np.float64)
    return ((gt - gt[:, 0:1]) / 1000.0).astype(np.float32)


def actions_from_items(items) -> np.ndarray:
    return np.array([i["action"] for i in items])


def single_eval(
    preds: np.ndarray,
    gt: np.ndarray,
    protocol2: bool = False,
    actions: Optional[np.ndarray] = None,
    action_order: Optional[Sequence[int]] = None,
) -> EvalReport:
    """Single-hypothesis `eval` (h36m.py:265-319): per-sample mean error,
    optionally action-wise."""
    report = multi_hypothesis_eval(
        preds[:, None], gt, protocol2=protocol2, actions=actions,
        action_order=action_order,
    )
    return report


def print_action_table(title: str, protocol2: bool, per_action: dict, error: float):
    """The PrettyTable report (h36m.py:313-317)."""
    table = Table([title] + [str(a) for a in per_action] + ["avg"])
    table.add_row(
        ["p2" if protocol2 else "p1"]
        + ["%.5f" % v for v in per_action.values()]
        + ["%.5f" % error]
    )
    print(table)
