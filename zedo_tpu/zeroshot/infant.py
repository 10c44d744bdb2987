"""ZeDO-i: the infant-pose variant of the zero-shot pipeline.

Rebuild of run/opt_main_infant.py:250-340 with its deltas from the adult
pipeline:
  * pelvis = joint 0 (mini) or mean(joints 0, 3) (syrip)
    (opt_main_infant.py:259-262);
  * the OIL init pose is NOT the cluster pose — it is the back-projected
    camera rays normalized by the pelvis-ray norm, scaled to ||T||, and
    pelvis-centered (opt_main_infant.py:281-292); the cluster pose only
    drives the IPO rotation fit;
  * the translation stays fixed until the final (1000 - refine_t_from)/1000
    fraction of the schedule — `refine_t_from` is expressed on the
    reference's 1000-step scale and rescaled to the configured iteration
    count (the reference hard-codes `i < 950`
    in the reference, opt_main_infant.py:310-313), then is re-solved;
  * confidences unused (conf=None).

Reference bugs not replicated (SURVEY §6): the checked-in script crashes on
`gradient_field_gen` return arity and resets its hypothesis accumulator per
iteration; the evidently intended behavior is implemented.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from zedo_tpu.diffusion.sampling import PCSampler
from zedo_tpu.diffusion.sde import SDE
from zedo_tpu.models import score_mlp
from zedo_tpu.ops.linalg import inv_intrinsics
from zedo_tpu.zeroshot.ipo import init_translation, run_ipo
from zedo_tpu.zeroshot.oil import OILResult, run_oil
from zedo_tpu.zeroshot.pipeline import SolveResult, ZeDOConfig

_EXACT = jax.lax.Precision.HIGHEST

# max-bone-length diagnostic skeleton (opt_main_infant.py:153-155)
INFANT_SKELETON = [[0, 1], [1, 2], [3, 4], [4, 5], [6, 7], [7, 8], [9, 10], [10, 11]]


def find_closest(data: jax.Array, dataset: jax.Array) -> jax.Array:
    """Nearest training pose by summed per-joint distance
    (opt_main_infant.py:56-62) — cluster-selection helper."""
    dist = jnp.sum(jnp.linalg.norm(dataset - data[None], axis=-1), axis=-1)
    return dataset[jnp.argmin(dist)]


def pelvis_2d(cond2d: jax.Array, pelvis_mode: str) -> jax.Array:
    """[B, 2] pelvis pixel: joint 0, or mean of joints 0 and 3 (syrip 12-joint
    convention) — opt_main_infant.py:259-262."""
    if pelvis_mode == "joint0":
        return cond2d[:, 0, :2]
    if pelvis_mode == "mean03":
        return (cond2d[:, 0, :2] + cond2d[:, 3, :2]) / 2
    raise ValueError(pelvis_mode)


def init_translation_infant(cond2d, k, t_norm, pelvis_mode: str) -> jax.Array:
    """Pelvis-ray translation init with the infant pelvis convention
    (opt_main_infant.py:259-263) — same solver as the adult ipo.init_translation."""
    return init_translation(cond2d, k, t_norm,
                            pelvis=pelvis_2d(cond2d, pelvis_mode))


def ray_init_pose(cond2d, k, t, pelvis_mode: str) -> jax.Array:
    """Back-projected rays scaled to ||T||, pelvis-centered
    (opt_main_infant.py:281-292). Note: rays are NOT z-normalized here — raw
    K^-1 [u, v, 1], normalized by the pelvis-ray norm."""
    hom = jnp.concatenate(
        [cond2d[..., :2], jnp.ones_like(cond2d[..., :1])], axis=-1
    )
    ray = jnp.einsum("bij,bnj->bni", inv_intrinsics(k), hom, precision=_EXACT)
    if pelvis_mode == "joint0":
        pelvis_norm = jnp.linalg.norm(ray[:, 0:1, :], axis=-1, keepdims=True)
    else:
        pelvis_norm = jnp.linalg.norm(
            (ray[:, 0:1, :] + ray[:, 3:4, :]) / 2, axis=-1, keepdims=True
        )
    ray = ray / pelvis_norm
    ray = ray * jnp.linalg.norm(t, axis=-1, keepdims=True)
    if pelvis_mode == "joint0":
        return ray - ray[:, 0:1, :]
    return ray - (ray[:, 0:1, :] + ray[:, 3:4, :]) / 2


def max_bone_length(pose: jax.Array) -> jax.Array:
    """Diagnostic: max skeleton bone length per sample
    (opt_main_infant.py:316-320; computed-but-unused there)."""
    lengths = jnp.stack(
        [jnp.linalg.norm(pose[:, a] - pose[:, b], axis=-1) for a, b in INFANT_SKELETON]
    )
    return jnp.max(lengths, axis=0)


def solve_one_hypothesis_infant(
    params: dict,
    model_apply,  # score_mlp.apply-compatible (control or plain)
    model_cfg: score_mlp.ScoreMLPConfig,
    sde: SDE,
    sampler: PCSampler,
    cfg: ZeDOConfig,
    cluster_pose: jax.Array,  # [j, 3] (NOT root-centered — matches :252-253)
    cond2d: jax.Array,
    k: jax.Array,
    pelvis_mode: str = "joint0",
    refine_t_from: int = 950,
    rng: Optional[jax.Array] = None,
    precision=None,
    reproj_weight: Optional[jax.Array] = None,
) -> OILResult:
    n = cond2d.shape[0]
    pose0 = jnp.broadcast_to(cluster_pose[None], (n,) + cluster_pose.shape)
    t0 = init_translation_infant(cond2d, k, cfg.ipo.t_norm, pelvis_mode)

    ipo = run_ipo(pose0, cond2d, k, cfg.ipo, t=t0)
    x0 = ray_init_pose(cond2d, k, ipo.translation, pelvis_mode)
    x0 = jnp.einsum("bij,bnj->bni", ipo.rot_mat, x0, precision=_EXACT)

    # the reference hard-codes `i < 950` against its fixed 1000-step schedule
    # (opt_main_infant.py:310-313) = "re-solve T in the final 5%"; scale that
    # intent to the configured iteration count so --override
    # ZeDO.OIL_iterations=K keeps a re-solve phase instead of silently never
    # re-solving (code-review r2)
    fixed = (refine_t_from * cfg.oil.iterations) // 1000
    oil_cfg = dataclasses.replace(cfg.oil, fixed_t_steps=fixed)
    return run_oil(
        params, model_cfg, sde, sampler, x0, ipo.translation,
        cond2d, k, None, oil_cfg, rng=rng, precision=precision,
        model_apply=model_apply, reproj_weight=reproj_weight,
    )


def solve_infant(
    params, model_apply, model_cfg, sde, sampler, cfg,
    cluster_poses, cond2d, k,
    pelvis_mode="joint0", refine_t_from=950, rng=None, precision=None,
    reproj_weight=None,
) -> SolveResult:
    """All hypotheses; returns [N, S, j, 3]."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, cluster_poses.shape[0])

    def one(cluster_pose, hyp_rng):
        return solve_one_hypothesis_infant(
            params, model_apply, model_cfg, sde, sampler, cfg,
            cluster_pose, cond2d, k,
            pelvis_mode=pelvis_mode, refine_t_from=refine_t_from,
            rng=hyp_rng, precision=precision, reproj_weight=reproj_weight,
        )

    result = jax.vmap(one)(cluster_poses, rngs)
    return SolveResult(
        poses=jnp.swapaxes(result.pose, 0, 1),
        translations=jnp.swapaxes(result.translation, 0, 1),
        reproj_px=result.reproj_px if cfg.oil.track_reproj else None,
    )


def solve_infant_sharded(
    mesh, params, model_apply, model_cfg, sde, sampler, cfg,
    cluster_poses, cond2d, k,
    pelvis_mode="joint0", refine_t_from=950, rng=None, precision=None,
    condition=None, data_axis: str = "data", row_mask=None,
) -> SolveResult:
    """Multi-chip infant solve (mirror of pipeline.solve_sharded, which see).

    `condition`: optional per-sample model condition [N, j, c] (the --cond
    CLI's normalized 2D keypoints), sharded with the batch; inside each shard
    it is substituted wherever the sampler passes condition=None — a
    full-batch closure (the single-program CLI pattern) would shape-mismatch
    against the local shard. With OILConfig.track_reproj the [S, steps] trace
    is cross-shard-averaged by one pmean (equal shards — pad N first with
    data.sharding.pad_batch and pass its mask as `row_mask` so pad rows are
    excluded from the diagnostic mean). Traced per call — CLIs solve once per
    run, and model_apply wrappers are per-run objects no lru_cache key could
    hold.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zedo_tpu.zeroshot.pipeline import _pad_aware_reproj_weight

    if rng is None:
        rng = jax.random.PRNGKey(0)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(data_axis))
    cond2d = jax.device_put(cond2d, batch)
    k = jax.device_put(k, batch)
    params = jax.device_put(params, repl)
    cluster_poses = jax.device_put(cluster_poses, repl)
    if condition is not None:
        condition = jax.device_put(condition, batch)
    weight = _pad_aware_reproj_weight(mesh, data_axis, cfg, row_mask)
    if weight is not None:
        weight = jax.device_put(weight, batch)

    bspec, rspec = P(data_axis), P()

    def _post(res: SolveResult) -> SolveResult:
        if not cfg.oil.track_reproj:
            return res
        return SolveResult(
            poses=res.poses, translations=res.translations,
            reproj_px=jax.lax.pmean(res.reproj_px, axis_name=data_axis))

    def _run(prm, clusters, c2d, kk, w, r, apply_fn):
        return _post(solve_infant(
            prm, apply_fn, model_cfg, sde, sampler, cfg, clusters, c2d, kk,
            pelvis_mode=pelvis_mode, refine_t_from=refine_t_from, rng=r,
            precision=precision, reproj_weight=w))

    has_w = weight is not None
    wspec = (bspec,) if has_w else ()

    if condition is None:
        def shard_fn(prm, clusters, c2d, kk, *rest):
            rest = list(rest)
            w = rest.pop(0) if has_w else None
            (r,) = rest
            return _run(prm, clusters, c2d, kk, w, r, model_apply)

        in_specs = (rspec, rspec, bspec, bspec) + wspec + (rspec,)
        args = (params, cluster_poses, cond2d, k,
                *((weight,) if has_w else ()), rng)
    else:
        def shard_fn(prm, clusters, c2d, kk, cond_local, *rest):
            rest = list(rest)
            w = rest.pop(0) if has_w else None
            (r,) = rest

            def apply_fn(p, cfg_m, x, labels, cond_arg, mask, **kw):
                eff = cond_local if cond_arg is None else cond_arg
                return model_apply(p, cfg_m, x, labels, eff, mask, **kw)

            return _run(prm, clusters, c2d, kk, w, r, apply_fn)

        in_specs = (rspec, rspec, bspec, bspec, bspec) + wspec + (rspec,)
        args = (params, cluster_poses, cond2d, k, condition,
                *((weight,) if has_w else ()), rng)

    out_specs = (
        SolveResult(poses=bspec, translations=bspec, reproj_px=rspec)
        if cfg.oil.track_reproj
        else SolveResult(poses=bspec, translations=bspec))
    mapped = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
    return jax.jit(mapped)(*args)
