"""Prior sampling / completion / denoising CLI.

Exposes the legacy GFPose-style task surface the reference documents in its
dead sampler (lib/sampling.py:460-592 — pose generation `gen`, 3D estimation
`est`, 2D/3D completion `comp2d`/`comp3d`, denoising `den`) as a working
command over the full-loop scan sampler:

    python -m zedo_tpu.run.sample --config configs/optim/..._h36m.py \
        --ckpt_dir ... --ckpt_name ... --task gen --num 64 --save out.npy
    ... --task comp3d --input poses.npy --jlist 14,15,16
    ... --task den --input noisy.npy
"""
from __future__ import annotations

import os

import numpy as np
from absl import app, flags
from absl.flags import argparse_flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:  # modules may be co-imported (tests, tooling)
    config_flags.DEFINE_config_file(
        "config", None, "Training configuration.", lock_config=False)
    flags.mark_flags_as_required(["config"])


def parse_args(argv):
    parser = argparse_flags.ArgumentParser(description="sample the pose prior")
    parser.add_argument("--ckpt_dir", type=str)
    parser.add_argument("--ckpt_name", type=str)
    parser.add_argument("--task", type=str, default="gen",
                        choices=["gen", "den", "est", "comp2d", "comp3d"])
    parser.add_argument("--num", type=int, default=64, help="samples (gen)")
    parser.add_argument("--input", type=str, default=None,
                        help="npy with [N, j, 3] inputs (den/est/comp*)")
    parser.add_argument("--jlist", type=str, default=None,
                        help="comma-separated joints to impute (comp*)")
    parser.add_argument("--randj", type=int, default=None,
                        help="random limb joints to impute (comp*)")
    parser.add_argument("--sampler", type=str, default=None,
                        choices=[None, "pc", "ode"], help="override config")
    parser.add_argument("--warm_start_steps", type=int, default=0,
                        help="legacy warm start (lib/sampling.py:564-567 used 50)")
    parser.add_argument("--guide", type=str, default=None,
                        choices=[None, "match", "sym"],
                        help="guidance objective descended each step "
                             "(reference sampling.py:359-397, never wired "
                             "there): 'match' pulls sample x-y toward "
                             "--guide_input 2D targets; 'sym' penalizes "
                             "left/right limb-length asymmetry")
    parser.add_argument("--guide_weight", type=float, default=1.0)
    parser.add_argument("--guide_input", type=str, default=None,
                        help="npy with [N, j, 2] 2D targets (--guide match)")
    parser.add_argument("--ema", action="store_true", default=False)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save", type=str, default="samples.npy")
    parser.add_argument("--override", action="append", default=[],
                        help="config override, e.g. --override model.num_scales=500")
    return parser.parse_args(argv[1:])


def main(args):
    from zedo_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from zedo_tpu.diffusion.ode import ODESampler
    from zedo_tpu.diffusion.sampling import PCSampler, make_task_mask
    from zedo_tpu.diffusion.score import get_score_fn
    from zedo_tpu.diffusion.sde import build_sde
    from zedo_tpu.models import score_mlp
    from zedo_tpu.models.registry import make_mlp_config

    config = FLAGS.config
    from zedo_tpu.utils.config import apply_overrides

    apply_overrides(config, getattr(args, "override", []))
    n_joints = config.DATASET.get("NUM_JOINT", 17)
    model_cfg = make_mlp_config(config, n_joints=n_joints)

    from zedo_tpu.utils.checkpoint import load_any_checkpoint

    ckpt_path = os.path.join(args.ckpt_dir, args.ckpt_name)
    params, _step = load_any_checkpoint(ckpt_path, model_cfg, use_ema=args.ema)

    sde = build_sde(
        config.training.sde,
        beta_min=config.model.beta_min, beta_max=config.model.beta_max,
        sigma_min=config.model.sigma_min, sigma_max=config.model.sigma_max,
        n=config.model.num_scales, t_max=1.0,  # full-range sampling
    )

    def model_fn(x, labels, condition, mask):
        return score_mlp.apply(params, model_cfg, x, labels, condition, mask)

    score_fn = get_score_fn(sde, model_fn, continuous=config.training.continuous)
    rng = jax.random.PRNGKey(args.seed)

    if args.input is not None:
        data = np.load(args.input).astype(np.float32)
        n = len(data)
    else:
        assert args.task == "gen", f"--input required for task {args.task}"
        data = None
        n = args.num
    shape = (n, n_joints, 3)

    method = args.sampler or config.sampling.method.lower()
    if method == "ode":
        if args.task != "gen":
            raise SystemExit(
                f"--task {args.task} requires the pc sampler (the task "
                "masks impute between pc steps); drop --sampler ode")
        if getattr(args, "guide", None):
            raise SystemExit("--guide requires the pc sampler "
                             "(guidance steps between predictor updates); "
                             "drop --sampler ode or the config's method=ode")
        sampler = ODESampler(sde=sde, shape=shape,
                             denoise=config.sampling.noise_removal, eps=1e-3)
        samples, nfe = sampler.sample(score_fn, rng)
        print(f"ODE sampler finished, nfe={int(nfe)}")
        if int(nfe) >= 20000 * 7:  # ode.rk45 max_steps budget
            print("WARNING: ODE step budget exhausted — integration may not "
                  "have reached t_eps; samples may be unconverged")
    else:
        sampler = PCSampler(
            sde=sde, predictor=config.sampling.predictor.lower(),
            corrector=config.sampling.corrector.lower(), snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each, probability_flow=False,
            continuous=config.training.continuous,
            denoise=config.sampling.noise_removal, eps=1e-3,
        )
        mask = None
        condition = None
        x_init = None
        if args.task != "gen":
            mask = jnp.asarray(
                make_task_mask(args.task, shape, jlist=args.jlist,
                               randj=args.randj, seed=args.seed)
            )
            condition = jnp.asarray(data)
            if args.task == "den":
                x_init = jnp.asarray(data)
                mask = None
        guidance_fn = None
        guidance_condition = None
        guide = getattr(args, "guide", None)
        if guide == "match":
            from zedo_tpu.diffusion.guidance import get_match_grad_fn

            if getattr(args, "guide_input", None) is None:
                raise SystemExit("--guide match requires --guide_input "
                                 "(npy with [N, j, 2] 2D targets)")
            guidance_condition = jnp.asarray(
                np.load(args.guide_input).astype(np.float32))
            guidance_fn = get_match_grad_fn(getattr(args, "guide_weight", 1.0))
        elif guide == "sym":
            from zedo_tpu.diffusion.guidance import get_sym_gradient_fn

            guidance_fn = get_sym_gradient_fn(getattr(args, "guide_weight", 1.0))
        samples = sampler.sample_loop(
            score_fn, rng, shape, condition=condition, mask=mask, x_init=x_init,
            warm_start_steps=args.warm_start_steps,
            guidance_fn=guidance_fn, guidance_condition=guidance_condition,
        )

    samples = np.asarray(samples)
    np.save(args.save, samples)
    print(f"saved {samples.shape} samples to {args.save}")


if __name__ == "__main__":
    app.run(main, flags_parser=parse_args)
