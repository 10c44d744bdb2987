"""The ZeDO zero-shot pipeline: cluster init -> IPO -> OIL, for S hypotheses.

Rebuild of run/opt_main.py:164-224. The reference iterates hypotheses in a
sequential Python loop (opt_main.py:166) and steps OIL on the host; here the
per-hypothesis program (IPO fit + 1000-step OIL scan) is vmapped over S and
jitted once, so an S=50 H36M evaluation is a single XLA program of shape
[S, N, ...] — and `solve_sharded` pjits it with N sharded across a device
mesh (ICI-scale data parallelism; weights replicated).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.diffusion.sampling import PCSampler
from zedo_tpu.diffusion.sde import SDE
from zedo_tpu.models import score_mlp
from zedo_tpu.zeroshot.ipo import IPOConfig, run_ipo
from zedo_tpu.zeroshot.oil import OILConfig, OILResult, run_oil

_EXACT = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class ZeDOConfig:
    """Static pipeline configuration — the config.ZeDO block
    (configs/optim/concat_pose_optimization_h36m.py:70-81)."""

    ipo: IPOConfig = IPOConfig()
    oil: OILConfig = OILConfig()

    @classmethod
    def from_config(cls, config) -> "ZeDOConfig":
        """Build from an ml_collections config with a ZeDO block."""
        z = config.ZeDO
        return cls(
            ipo=IPOConfig(
                iterations=z.IPO_iterations,
                keypoint_list=tuple(z.IPO_keylist),
                rot_axes=z.RotAxes,
                t_norm=z.IPO_T,
                min_scale_t=z.IPO_minScaleT,
                max_scale_t=z.IPO_maxScaleT,
            ),
            oil=OILConfig(
                iterations=z.OIL_iterations,
                sampling_eps=z.sampling_eps,
                # opt-in NFE reduction, reachable from any CLI via
                # `--override ZeDO.score_reuse=2` (exact dynamics at 1;
                # +0.1mm characterized at 2 — test_system_synthetic.py)
                score_reuse=int(z.get("score_reuse", 1)),
                # exact-GN escape hatch (--override ZeDO.gn_fp32=True)
                gn_fp32=bool(z.get("gn_fp32", False)),
                # kernel-path overrides (--override ZeDO.use_pallas=True /
                # ZeDO.pallas_interpret=True); interpret emulates the kernel
                # in XLA so the pallas path runs off-TPU too
                use_pallas=z.get("use_pallas", None),
                pallas_interpret=bool(z.get("pallas_interpret", False)),
            ),
        )


class SolveResult(NamedTuple):
    poses: jax.Array  # [N, S, j, 3]
    translations: jax.Array  # [N, S, 1, 3]
    # [S, steps] per-step mean pixel reprojection error when the solve ran
    # with OILConfig.track_reproj (infant CLI); None otherwise
    reproj_px: Optional[jax.Array] = None


def solve_one_hypothesis(
    params: dict,
    model_cfg: score_mlp.ScoreMLPConfig,
    sde: SDE,
    sampler: PCSampler,
    cfg: ZeDOConfig,
    cluster_pose: jax.Array,  # [j, 3] one cluster-center pose
    cond2d: jax.Array,  # [N, j, >=2]
    conf: Optional[jax.Array],  # [N, j] or None
    k: jax.Array,  # [N, 3, 3]
    rng: Optional[jax.Array] = None,
    precision=None,
    model_apply=None,
    reproj_weight: Optional[jax.Array] = None,
) -> OILResult:
    """One hypothesis over the full batch (the body of opt_main.py:166-220).

    model_apply: score_mlp.apply-compatible fn for non-standard networks
    (ControlNet adapter, conditional model); None = the standard ScoreMLP
    (fast path when the sampler qualifies)."""
    n = cond2d.shape[0]
    # root-center the cluster pose and broadcast (opt_main.py:167-168)
    pose0 = cluster_pose - cluster_pose[0:1, :]
    pose0 = jnp.broadcast_to(pose0[None], (n,) + pose0.shape)

    ipo = run_ipo(pose0, cond2d, k, cfg.ipo)
    # rotate the init pose by the fitted rotation (opt_main.py:201)
    x0 = jnp.einsum("bij,bnj->bni", ipo.rot_mat, pose0, precision=_EXACT)

    return run_oil(
        params, model_cfg, sde, sampler,
        x0, ipo.translation, cond2d, k, conf, cfg.oil,
        rng=rng, precision=precision, model_apply=model_apply,
        reproj_weight=reproj_weight,
    )


def solve(
    params: dict,
    model_cfg: score_mlp.ScoreMLPConfig,
    sde: SDE,
    sampler: PCSampler,
    cfg: ZeDOConfig,
    cluster_poses: jax.Array,  # [S, j, 3]
    cond2d: jax.Array,  # [N, j, >=2]
    conf: Optional[jax.Array],
    k: jax.Array,
    rng: Optional[jax.Array] = None,
    precision=None,
    model_apply=None,
    reproj_weight: Optional[jax.Array] = None,
) -> SolveResult:
    """All S hypotheses via vmap; returns [N, S, j, 3] (opt_main.py:222-224)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, cluster_poses.shape[0])

    def one(cluster_pose, hyp_rng):
        return solve_one_hypothesis(
            params, model_cfg, sde, sampler, cfg,
            cluster_pose, cond2d, conf, k, rng=hyp_rng, precision=precision,
            model_apply=model_apply, reproj_weight=reproj_weight,
        )

    result = jax.vmap(one)(cluster_poses, rngs)  # [S, N, ...]
    return SolveResult(
        poses=jnp.swapaxes(result.pose, 0, 1),
        translations=jnp.swapaxes(result.translation, 0, 1),
        reproj_px=result.reproj_px if cfg.oil.track_reproj else None,
    )


_solve_jitted = jax.jit(
    solve, static_argnames=("model_cfg", "sde", "sampler", "cfg", "precision",
                            "model_apply")
)


def solve_jit(params, model_cfg, sde, sampler, cfg, cluster_poses, cond2d, conf, k,
              rng=None, precision=None, model_apply=None) -> SolveResult:
    """jitted entry; static pieces (configs/sde/sampler/model_apply) are
    hashable, so retracing only happens when they change."""
    return _solve_jitted(
        params, model_cfg=model_cfg, sde=sde, sampler=sampler, cfg=cfg,
        cluster_poses=cluster_poses, cond2d=cond2d, conf=conf, k=k,
        rng=rng, precision=precision, model_apply=model_apply)


def solve_sharded(
    mesh,
    params: dict,
    model_cfg: score_mlp.ScoreMLPConfig,
    sde: SDE,
    sampler: PCSampler,
    cfg: ZeDOConfig,
    cluster_poses,
    cond2d,
    conf,
    k,
    rng=None,
    precision=None,
    data_axis: str = "data",
    model_apply=None,
    row_mask=None,
) -> SolveResult:
    """Multi-chip solve: shard the pose batch N over `data_axis` of `mesh`
    via `shard_map`, replicate weights and cluster poses. The poses need no
    collectives (independent per sample); shard_map guarantees the whole
    per-shard program — including the fused pallas kernel, which GSPMD
    cannot partition through a custom call — runs independently per device.
    With OILConfig.track_reproj the per-step mean reprojection trace is
    cross-shard-averaged by one pmean ([S, steps] scalars, ICI-cheap), so the
    infant CLI's diagnostic works on a mesh too.

    N must be divisible by the mesh data-axis size — use
    data.sharding.pad_batch (the DistributedEvalSampler replacement,
    SURVEY §2.6). Pass pad_batch's mask as `row_mask` so the track_reproj
    trace averages over the TRUE batch only — without it, edge-replicated
    pad rows participate in the diagnostic mean (poses are unaffected
    either way; pads are dropped by sharding.unpad).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if rng is None:
        rng = jax.random.PRNGKey(0)
    repl = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(data_axis))

    cond2d = jax.device_put(cond2d, batch_sharded)
    k = jax.device_put(k, batch_sharded)
    if conf is not None:
        conf = jax.device_put(conf, batch_sharded)
    params = jax.device_put(params, repl)
    cluster_poses = jax.device_put(cluster_poses, repl)

    weight = _pad_aware_reproj_weight(mesh, data_axis, cfg, row_mask)
    if weight is not None:
        weight = jax.device_put(weight, batch_sharded)

    fn = _sharded_solve_fn(
        mesh, data_axis, conf is not None, weight is not None, model_cfg,
        sde, sampler, cfg, precision, model_apply,
    )
    args = [params, cluster_poses, cond2d]
    if conf is not None:
        args.append(conf)
    args.append(k)
    if weight is not None:
        args.append(weight)
    return fn(*args, rng)


def _pad_aware_reproj_weight(mesh, data_axis, cfg, row_mask):
    """[N] per-row reproj-trace weights from pad_batch's real-row mask, or
    None for uniform. Weights are mask * D / n_real so that after the
    per-shard weighted SUM and the cross-shard pmean (which divides by the
    data-axis size D), the trace equals the mean over real rows only."""
    if not cfg.oil.track_reproj or row_mask is None:
        return None
    m = np.asarray(row_mask, np.float32)
    n_real = float(m.sum())
    if n_real == 0:
        raise ValueError("row_mask marks no real rows")
    return jnp.asarray(m * (mesh.shape[data_axis] / n_real))


@functools.lru_cache(maxsize=32)
def _sharded_solve_fn(mesh, data_axis, has_conf, has_weight, model_cfg, sde,
                      sampler, cfg, precision, model_apply=None):
    from jax.sharding import PartitionSpec as P

    b = P(data_axis)
    r = P()

    def _post(res: SolveResult) -> SolveResult:
        if not cfg.oil.track_reproj:
            return res
        # the reproj trace is a per-step batch mean ([S, steps], no batch
        # axis): average the equal-sized shards' local means over the data
        # axis — the solve's ONLY collective, one pmean of S*steps scalars
        # (VERDICT r4 next #7; the poses themselves stay collective-free)
        return SolveResult(
            poses=res.poses, translations=res.translations,
            reproj_px=jax.lax.pmean(res.reproj_px, axis_name=data_axis),
        )

    def shard_fn(params, clusters, cond2d, *rest):
        rest = list(rest)
        conf = rest.pop(0) if has_conf else None
        k = rest.pop(0)
        weight = rest.pop(0) if has_weight else None
        (rng,) = rest
        return _post(solve(params, model_cfg, sde, sampler, cfg,
                           clusters, cond2d, conf, k, rng=rng,
                           precision=precision, model_apply=model_apply,
                           reproj_weight=weight))

    in_specs = ((r, r, b) + ((b,) if has_conf else ())
                + (b,) + ((b,) if has_weight else ()) + (r,))

    if cfg.oil.track_reproj:
        # post-pmean the trace is replicated across the data axis
        out_specs = SolveResult(poses=b, translations=b, reproj_px=r)
    else:
        out_specs = SolveResult(poses=b, translations=b)
    mapped = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,  # params/rng used replicated (reproj pmean is the
        #                   only collective, and only under track_reproj)
    )
    return jax.jit(mapped)
