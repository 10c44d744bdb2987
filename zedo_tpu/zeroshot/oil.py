"""Optimization-In-the-Loop (OIL): alternate camera-ray gradient updates with
single reverse-diffusion steps along an annealed time schedule.

Rebuild of the reference's hot loop (run/opt_main.py:202-220): 1000 sequential
Python iterations, each bouncing the full batch through a torch sampler that
round-trips device->numpy->device (advanced/sampling.py:524-527,
opt_main.py:220). Here the entire loop is ONE `lax.scan` inside jit: zero host
traffic, and everything that is invariant across steps is hoisted out:

  * camera rays, unit rays, confidence weights, and the 3x3 normal-equation
    inverse of the translation solve depend only on (2D keypoints, K, conf)
    — computed once, not 1000x (simple_zeroshot_opt.py:61-92 recomputes all
    of it every call);
  * the score network's time embedding depends only on the step's t — the
    [steps, embed] table and the per-step scalar coefficients (beta, g^2,
    std) are precomputed and fed to the scan as xs.

The fast path specializes the shipped configuration — sub-VP SDE,
euler_maruyama predictor, no corrector, probability_flow=True (forced at
opt_main.py:157), continuous labels t*999 — for which the reverse update is
the deterministic affine step
    x' = x + (0.5*beta(t)*x - g2(t) * model(x, t*999) / std(t)) / N
(score = -model/std, so the model term enters with a minus sign).
A generic path drives any registered predictor/corrector via
PCSampler.zedo_pc_step for non-standard configs.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from zedo_tpu.diffusion.sampling import PCSampler
from zedo_tpu.diffusion.score import CONTINUOUS_LABEL_SCALE, get_score_fn
from zedo_tpu.diffusion.sde import SDE, SubVPSDE
from zedo_tpu.models import score_mlp
from zedo_tpu.ops.camera import backproject_rays
from zedo_tpu.ops.gradient_field import (
    confidence_weights, flip_negative_z, normal_matrix, normal_rhs,
    perpendicular_distance,
)
from zedo_tpu.ops.linalg import inv3x3

_EXACT = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class OILConfig:
    """Mirrors config.ZeDO OIL keys (configs/optim/*.py:78-81)."""

    iterations: int = 1000
    sampling_eps: float = 0.01
    # steps that keep the IPO translation before re-solving each step;
    # the reference uses iterations // 5 (opt_main.py:203)
    fixed_t_steps: Optional[int] = None
    # None = auto: fused pallas score kernel when params are bf16, the
    # backend is a TPU, and the architecture matches the kernel contract
    use_pallas: Optional[bool] = None
    # run the pallas kernel in interpret mode (pure-XLA emulation): lets the
    # kernel path — including per-shard auto-tile selection — co-execute
    # with a multi-device mesh on the CPU backend (shard_map partitions
    # around the kernel, pipeline.py solve_sharded). Force with
    # use_pallas=True; off-TPU the kernel requires interpret=True
    pallas_interpret: bool = False
    # None = auto: smallest padded batch among {512, 256, 128} (largest tile
    # on ties). Under the per-hypothesis vmap the batch is N poses, not N*S
    # (e.g. H36M N=886: tile 256 pads to 1024 = 15% waste, tile 128 to 896 =
    # 1% — measured 3.26 s -> 3.03 s on the headline eval); at tile-aligned
    # flat batches larger tiles win slightly.
    pallas_tile: Optional[int] = None
    # OPT-IN acceleration (default 1 = exact reference dynamics): evaluate
    # the score network every k-th step and reuse the previous output in
    # between (past-score reuse in the spirit of training-free accelerators
    # like PFDiff — adjacent OIL timesteps differ by only 9e-5 in t, and the
    # geometry step still runs every iteration). k=2 halves NFE.
    score_reuse: int = 1
    # run the pallas kernel's GroupNorm stats matmuls in f32 regardless of
    # the weight dtype (exact-GN mode; the bf16 default costs +0.02mm —
    # ops/pallas/score_kernel.py); reachable via --override ZeDO.gn_fp32=True
    gn_fp32: bool = False
    # carry the mean |K(x+T) - cond2d| pixel reprojection error out of the
    # scan each step (the reference's per-iteration `projection_error` log,
    # opt_main_infant.py:306-308); off by default — it adds a [B, j, 3]
    # projection einsum per step to the hot loop
    track_reproj: bool = False

    @property
    def n_fixed(self) -> int:
        return self.iterations // 5 if self.fixed_t_steps is None else self.fixed_t_steps


class Geometry(NamedTuple):
    """Step-invariant geometric precomputation."""

    rays_unit: jax.Array  # [B, j, 3] unit camera rays
    rx: jax.Array  # [B, j] z-normalized ray x
    ry: jax.Array  # [B, j]
    w: jax.Array  # [B, j] conf^4 weights (or ones)
    ata_inv: jax.Array  # [B, 3, 3] inverse normal matrix for the T solve


def precompute_geometry(
    cond2d: jax.Array, k: jax.Array, conf: Optional[jax.Array]
) -> Geometry:
    """Hoist everything of gradient_field_gen that doesn't depend on x."""
    rays = backproject_rays(cond2d[..., :2], k)  # z == 1
    rays_unit = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rx, ry = rays[..., 0], rays[..., 1]
    w = confidence_weights(conf, rx)
    return Geometry(
        rays_unit=rays_unit, rx=rx, ry=ry, w=w,
        ata_inv=inv3x3(normal_matrix(rx, ry, w)),
    )


def solve_translation_fast(geo: Geometry, key3d: jax.Array) -> jax.Array:
    """T = ATA^-1 ATb with the precomputed inverse; z-flip as in the
    reference (simple_zeroshot_opt.py:92-93). Returns [B, 1, 3]."""
    atb = normal_rhs(geo.rx, geo.ry, geo.w, key3d)
    # HIGHEST: the per-step translation feeds the ray gradient; bf16 MXU
    # rounding here is ~5-10mm on a ~3m translation (geometry stays exact)
    t = jnp.einsum("bij,bj->bi", geo.ata_inv, atb, precision=_EXACT)
    return flip_negative_z(t)[:, None, :]


def ray_gradient(geo: Geometry, key3d: jax.Array, t: jax.Array) -> jax.Array:
    """Perpendicular-foot gradient toward the rays (simple_zeroshot_opt.py:109)."""
    return perpendicular_distance(key3d + t, geo.rays_unit)


class OILResult(NamedTuple):
    pose: jax.Array  # [B, j, 3] final root-relative pose estimate
    translation: jax.Array  # [B, 1, 3] final solved camera translation
    grad_norms: jax.Array  # [steps] mean ray-gradient norm per step (diagnostic)
    # [steps] mean pixel reprojection error per step when
    # OILConfig.track_reproj, else a zero scalar per step (free under XLA DCE)
    reproj_px: Optional[jax.Array] = None


def _fast_supported(sde: SDE, sampler: PCSampler) -> bool:
    return (
        isinstance(sde, SubVPSDE)
        and sampler.predictor == "euler_maruyama"
        and sampler.corrector == "none"
        and sampler.probability_flow
        and sampler.denoise
    )


def run_oil(
    params: dict,
    model_cfg: score_mlp.ScoreMLPConfig,
    sde: SDE,
    sampler: PCSampler,
    x0: jax.Array,
    t0: jax.Array,
    cond2d: jax.Array,
    k: jax.Array,
    conf: Optional[jax.Array],
    cfg: OILConfig,
    rng: Optional[jax.Array] = None,
    precision=None,
    model_apply=None,
    reproj_weight: Optional[jax.Array] = None,
) -> OILResult:
    """The full OIL loop as one scan.

    x0: [B, j, 3] rotated init pose (IPO output applied, opt_main.py:201);
    t0: [B, 1, 3] IPO translation; cond2d: [B, j, >=2]; conf: [B, j] or None.
    rng is only needed for the generic (noise-injecting) path.
    model_apply: score_mlp.apply-compatible fn for custom networks (ControlNet
    adapter, conditional model); those always take the generic path.
    reproj_weight: optional [B] per-row weights for the track_reproj trace
    (must sum to 1 for a mean; None = uniform). The sharded solves use it to
    zero edge-replicated pad rows out of the diagnostic.
    """
    if not isinstance(sampler, PCSampler):
        # config.sampling.method='ode' reaches here through the CLIs'
        # get_sampling_fn; the OIL loop is defined by single pc steps at
        # external t (reference opt_main.py:210-218) — the full-transport
        # ODE sampler has no such step. Fail with the reason instead of an
        # AttributeError deep inside the scan.
        raise TypeError(
            "the OIL loop requires the pc sampler (one corrector+predictor "
            "step per iteration); config.sampling.method='ode' is only "
            "valid for full-loop sampling (run/sample.py)"
        )
    geo = precompute_geometry(cond2d, k, conf)
    timestamps = jnp.linspace(sde.T, cfg.sampling_eps, cfg.iterations)

    if cfg.track_reproj:
        # mean |K(x+T) - cond2d| pixel error, the reference's per-iteration
        # `projection_error` diagnostic (opt_main_infant.py:306-308), computed
        # at step entry (before the T re-solve) exactly as the reference does
        def reproj_fn(x, t_cur):
            cam = x + t_cur
            proj = jnp.einsum("bij,bnj->bni", k, cam, precision=_EXACT)
            px = proj[..., :2] / proj[..., 2:]
            err = jnp.abs(px - cond2d[..., :2])
            if reproj_weight is None:
                return jnp.mean(err)
            # weighted row mean (weights sum to 1 across the TRUE batch —
            # the sharded solves zero pad rows and fold the cross-shard
            # pmean's 1/D into the weights)
            return jnp.sum(reproj_weight * jnp.mean(err, axis=(1, 2)))
    else:
        def reproj_fn(x, t_cur):
            return jnp.float32(0.0)

    # scale_by_sigma models must take the generic path: apply_with_temb has
    # no sigma division (the pallas kernel likewise), so the fast path would
    # either crash (XLA branch, used_sigmas=None) or silently skip the
    # output scaling (kernel branch). Shipped configs set it False.
    standard_model = ((model_apply is None or model_apply is score_mlp.apply)
                      and not model_cfg.scale_by_sigma)
    if standard_model and _fast_supported(sde, sampler):
        return _run_oil_fast(
            params, model_cfg, sde, geo, x0, t0, timestamps, cfg, precision,
            reproj_fn,
        )
    return _run_oil_generic(
        params, model_cfg, sde, sampler, geo, x0, t0, timestamps, cfg, rng,
        precision, model_apply or score_mlp.apply, reproj_fn,
    )


def _auto_tile(b: int, candidates=(512, 256, 128)) -> int:
    """Smallest padded batch wins; largest tile on ties (see OILConfig)."""
    return min(candidates, key=lambda t: (-(-b // t) * t, -t))


def _pallas_eligible(params, model_cfg) -> bool:
    """Kernel contract: 2 blocks, lane-aligned hidden, bf16 weights, and a
    TPU-class backend (capability probe, not a platform-name allowlist —
    utils.config.is_tpu_like)."""
    if model_cfg.n_blocks != 2 or model_cfg.hidden_dim % 128 != 0:
        return False
    if params["post_dense"]["weight"].dtype != jnp.bfloat16:
        return False
    from zedo_tpu.utils.config import is_tpu_like

    return is_tpu_like()


def _run_oil_fast(
    params, model_cfg, sde: SubVPSDE, geo: Geometry, x0, t0, timestamps, cfg,
    precision, reproj_fn,
) -> OILResult:
    # model compute dtype follows the params (bf16 weights -> bf16 MXU path);
    # geometry stays in the x dtype (f32)
    model_dtype = params["post_dense"]["weight"].dtype
    # per-step constants (all [steps])
    t = timestamps
    beta = sde.beta_min + t * (sde.beta_max - sde.beta_min)
    discount = 1.0 - jnp.exp(-2.0 * sde.beta_min * t - (sde.beta_max - sde.beta_min) * t**2)
    g2 = beta * discount
    lmc = -0.25 * t**2 * (sde.beta_max - sde.beta_min) - 0.5 * t * sde.beta_min
    std = 1.0 - jnp.exp(2.0 * lmc)
    # x_mean = x + drift * dt with drift = -0.5*beta*x - g^2*score,
    # score = -model_out/std, dt = -1/N  =>  x_mean = x + c1*x - c2*model_out
    inv_n = 1.0 / sde.n
    c1 = 0.5 * beta * inv_n
    c2 = g2 / std * inv_n

    # [steps, embed] shared time embedding table — computed once
    temb_table = score_mlp.time_embedding(params, model_cfg, t * CONTINUOUS_LABEL_SCALE)

    resolve = jnp.arange(cfg.iterations) >= cfg.n_fixed

    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = _pallas_eligible(params, model_cfg)

    if use_pallas:
        from zedo_tpu.ops.pallas import score_kernel as sk

        packed = sk.pack_weights(
            params, model_cfg, dtype=model_dtype,
            gn_dtype=jnp.float32 if cfg.gn_fp32 else None,
        )
        # [steps, 5, H] per-step layer vectors, precomputed outside the scan
        vecs_table = jax.vmap(lambda e: sk.step_vectors(packed, e))(temb_table)
        io = model_cfg.n_joints * model_cfg.joint_dim
        io_pad = ((io + sk.LANE - 1) // sk.LANE) * sk.LANE
        b = x0.shape[0]
        tile = cfg.pallas_tile or _auto_tile(b)
        b_pad = ((b + tile - 1) // tile) * tile

        def model_forward(x_flat, step_xs):
            vecs = step_xs
            x_in = jnp.pad(x_flat, ((0, b_pad - b), (0, io_pad - io)))
            out = sk.fused_score_forward(x_in, packed, vecs, tile=tile,
                                         interpret=cfg.pallas_interpret)
            return out[:b, :io]

        step_tables = vecs_table
    else:

        def model_forward(x_flat, step_xs):
            temb = step_xs
            out = score_mlp.apply_with_temb(
                params, model_cfg,
                x_flat.reshape(x0.shape).astype(model_dtype), temb,
                precision=precision,
            ).astype(x_flat.dtype)
            return out.reshape(x_flat.shape)

        step_tables = temb_table

    reuse = max(1, cfg.score_reuse)
    eval_mask = (jnp.arange(cfg.iterations) % reuse) == 0

    def body(carry, xs):
        x, t_cur, out_prev = carry
        step_xs, c1_i, c2_i, resolve_i, eval_i = xs
        reproj = reproj_fn(x, t_cur)
        t_new = solve_translation_fast(geo, x)
        t_cur = jnp.where(resolve_i, t_new, t_cur)
        grad = ray_gradient(geo, x, t_cur)
        x = x + grad
        if reuse == 1:
            out = model_forward(x.reshape(x.shape[0], -1), step_xs)
            out = out.reshape(x.shape).astype(x.dtype)
        else:
            # predicate is batch-uniform (pure step index), so lax.cond stays
            # a real branch even under the hypothesis vmap
            out = jax.lax.cond(
                eval_i,
                lambda x_: model_forward(x_.reshape(x_.shape[0], -1), step_xs)
                .reshape(x_.shape).astype(x_.dtype),
                lambda x_: out_prev,
                x,
            )
        x = x + c1_i * x - c2_i * out
        ys = (jnp.mean(jnp.linalg.norm(grad, axis=-1)), reproj)
        return (x, t_cur, out), ys

    (x, t_final, _), (grad_norms, reproj_px) = jax.lax.scan(
        body, (x0, t0, jnp.zeros_like(x0)),
        (step_tables, c1, c2, resolve, eval_mask),
    )
    return OILResult(pose=x, translation=t_final, grad_norms=grad_norms,
                     reproj_px=reproj_px)


def _run_oil_generic(
    params, model_cfg, sde, sampler: PCSampler, geo: Geometry, x0, t0,
    timestamps, cfg, rng, precision, model_apply=score_mlp.apply,
    reproj_fn=lambda x, t: jnp.float32(0.0),
) -> OILResult:
    """Any predictor/corrector via the registry; one zedo_pc_step per
    iteration (matches sampling.py:450-527 semantics exactly at
    score_reuse=1).

    score_reuse > 1 (the NFE knob, available to ControlNet/cond adapter
    models since r5): the raw network output is evaluated every k-th step
    via lax.cond and held in the scan carry in between; each step the frozen
    output is converted to a score with the CURRENT std
    (diffusion.score.split_score_fn — the same decomposition the fast path
    uses). Within a reused step the corrector sees the frozen output too
    (a langevin corrector's inner refinements reuse it), which is the stated
    approximation; at k=1 nothing is frozen and dynamics are exact."""
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def model_fn(x, labels, condition, mask):
        return model_apply(params, model_cfg, x, labels, condition, mask,
                           precision=precision)

    score_fn = get_score_fn(sde, model_fn, continuous=sampler.continuous)
    resolve = jnp.arange(cfg.iterations) >= cfg.n_fixed
    reuse = max(1, cfg.score_reuse)

    if reuse == 1:

        def body(carry, xs):
            x, t_cur = carry
            t_i, resolve_i, i = xs
            reproj = reproj_fn(x, t_cur)
            t_new = solve_translation_fast(geo, x)
            t_cur = jnp.where(resolve_i, t_new, t_cur)
            grad = ray_gradient(geo, x, t_cur)
            x = x + grad
            step_rng = jax.random.fold_in(rng, i)
            x_next, x_mean = sampler.zedo_pc_step(score_fn, step_rng, x, t_i)
            x = x_mean if sampler.denoise else x_next
            return (x, t_cur), (jnp.mean(jnp.linalg.norm(grad, axis=-1)), reproj)

        (x, t_final), (grad_norms, reproj_px) = jax.lax.scan(
            body, (x0, t0), (timestamps, resolve, jnp.arange(cfg.iterations))
        )
        return OILResult(pose=x, translation=t_final, grad_norms=grad_norms,
                         reproj_px=reproj_px)

    from zedo_tpu.diffusion.score import split_score_fn

    eval_fn, score_from_out = split_score_fn(
        sde, model_fn, continuous=sampler.continuous)
    eval_mask = (jnp.arange(cfg.iterations) % reuse) == 0

    def body(carry, xs):
        x, t_cur, out_prev = carry
        t_i, resolve_i, eval_i, i = xs
        reproj = reproj_fn(x, t_cur)
        t_new = solve_translation_fast(geo, x)
        t_cur = jnp.where(resolve_i, t_new, t_cur)
        grad = ray_gradient(geo, x, t_cur)
        x = x + grad
        vec_t = jnp.broadcast_to(jnp.asarray(t_i, x.dtype), (x.shape[0],))
        # batch-uniform predicate (pure step index): lax.cond stays a real
        # branch even under the hypothesis vmap, so skipped steps cost no NFE
        out = jax.lax.cond(
            eval_i,
            lambda x_: eval_fn(x_, vec_t).astype(x_.dtype),
            lambda x_: out_prev,
            x,
        )

        def frozen_score_fn(x_, t_, condition=None, mask=None):
            return score_from_out(out, x_, t_)

        step_rng = jax.random.fold_in(rng, i)
        x_next, x_mean = sampler.zedo_pc_step(frozen_score_fn, step_rng, x, t_i)
        x = x_mean if sampler.denoise else x_next
        return (x, t_cur, out), (jnp.mean(jnp.linalg.norm(grad, axis=-1)), reproj)

    (x, t_final, _), (grad_norms, reproj_px) = jax.lax.scan(
        body, (x0, t0, jnp.zeros_like(x0)),
        (timestamps, resolve, eval_mask, jnp.arange(cfg.iterations)),
    )
    return OILResult(pose=x, translation=t_final, grad_norms=grad_norms,
                     reproj_px=reproj_px)
