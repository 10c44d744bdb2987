"""Main zero-shot evaluation CLI (reference run/opt_main.py).

Usage (flag surface matches the reference, opt_main.py:42-50):
    python -m zedo_tpu.run.opt_main --config configs/optim/concat_pose_optimization_h36m.py \
        --ckpt_dir checkpoint/ --ckpt_name checkpoint_1500.pth [--gt] [--hypo S]
Extras: --ema applies the EMA weights (the reference loads them but never
does — opt_main.py:135, SURVEY §6); --dtype bf16 runs the score net on the
MXU's native dtype; --save stores [N, S, j, 3] results; --seed.

TPU execution model: the hypothesis loop and the 1000-step OIL loop are one
jitted program; the pose batch is padded to the device count and sharded over
a 1D mesh (zedo_tpu/zeroshot/pipeline.py).
"""
from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np
from absl import app, flags
from absl.flags import argparse_flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:  # modules may be co-imported (tests, tooling)
    config_flags.DEFINE_config_file(
        "config", None, "Training configuration.", lock_config=False)
    flags.mark_flags_as_required(["config"])

N_JOINTS = 17
JOINT_DIM = 3
HIDDEN_DIM = 1024
EMBED_DIM = 512
CONDITION_DIM = 3

CLUSTER_FILES = {  # opt_main.py:58-65
    "h36m": "h36m_cluster{s}.npy",
    "3dhp": "3dhp_cluster{s}.npy",
    "3dpw": "h36m_cluster{s}.npy",
    "ski": "h36m_sitting_cluster{s}.npy",
    "wild": "h36m_cluster{s}.npy",  # inference.py:68-69
}


def parse_args(argv):
    parser = argparse_flags.ArgumentParser(description="valid score model")
    parser.add_argument("--ckpt_dir", type=str)
    parser.add_argument("--ckpt_name", type=str)
    parser.add_argument("--gt", action="store_true", default=False,
                        help="use gt2d as condition")
    parser.add_argument("--hypo", type=int, default=1, help="number of hypotheses")
    parser.add_argument("--ema", action="store_true", default=False,
                        help="apply EMA weights (reference loads-but-ignores them)")
    parser.add_argument("--dtype", type=str, default="auto",
                        choices=["auto", "fp32", "bf16"],
                        help="auto = bf16 on TPU (the benchmarked flagship "
                             "path; e2e delta vs fp32 bounded at 0.010mm), "
                             "fp32 elsewhere")
    parser.add_argument("--save", type=str, default=None, help="save results .npy")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cluster_dir", type=str, default="clusters")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--strict_batch", action="store_true", default=False,
                        help="enforce config.ZeDO.batch == len(dataset) "
                             "(reference asserts, opt_main.py:162)")
    parser.add_argument("--override", action="append", default=[],
                        help="config override, e.g. --override ZeDO.OIL_iterations=500")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler device trace of the solve "
                             "into DIR (view with TensorBoard/xprof)")
    return parser.parse_args(argv[1:])


def load_clusters(cluster_dir: str, dataset: str, hypo: int) -> np.ndarray:
    from zedo_tpu.utils.checkpoint import convert_cluster_file

    name = CLUSTER_FILES[dataset].format(s=hypo)
    path = os.path.join(cluster_dir, name)
    if not os.path.exists(path) and os.path.exists(path.replace(".npy", ".pkl")):
        path = path.replace(".npy", ".pkl")  # README ships .pkl names
    return convert_cluster_file(path)


def build_dataset(config, args):
    from zedo_tpu.data import DATASETS

    ds_name = config.data.dataset
    if ds_name in ("mini", "syrip"):
        # infant readers take (subset, ...) and the infant pipeline differs
        # (pelvis modes, ray init) — an opaque TypeError otherwise
        raise SystemExit(
            f"dataset {ds_name!r} is evaluated by the infant CLI: "
            "python -m zedo_tpu.run.opt_main_infant --config ..."
        )
    cls = DATASETS[ds_name]
    kwargs = dict(
        subset="test", gt2d=args.gt, abs_coord=True,
        sample_interval=config.ZeDO.sample, flip=False,
    )
    if ds_name == "wild":
        return cls(Path(args.data_dir, "wild"), sample_interval=config.ZeDO.sample)
    return cls(Path(args.data_dir, ds_name), **kwargs)


def run_pipeline(config, args, dataset, logger_print=print):
    """Shared solve path for opt_main and inference."""
    import jax
    import jax.numpy as jnp

    from zedo_tpu.data import sharding as shard_lib
    from zedo_tpu.diffusion.sampling import get_sampling_fn
    from zedo_tpu.diffusion.sde import build_sde
    from zedo_tpu.models.registry import make_mlp_config
    from zedo_tpu.parallel.mesh import default_mesh
    from zedo_tpu.zeroshot import pipeline

    sample_poses = load_clusters(args.cluster_dir, config.data.dataset, args.hypo)
    model_cfg = make_mlp_config(
        config, n_joints=N_JOINTS, joint_dim=JOINT_DIM,
        hidden_dim=HIDDEN_DIM, embed_dim=EMBED_DIM, cond_dim=CONDITION_DIM,
    )

    from zedo_tpu.utils.checkpoint import load_any_checkpoint

    ckpt_path = os.path.join(args.ckpt_dir, args.ckpt_name)
    logger_print(f"loading model from {ckpt_path}")
    params, step = load_any_checkpoint(ckpt_path, model_cfg,
                                       use_ema=args.ema, log=logger_print)
    logger_print(f"=> loaded checkpoint '{ckpt_path}' (step {step})")
    from zedo_tpu.utils.config import resolve_dtype

    dtype = resolve_dtype(args.dtype)
    if dtype != args.dtype:
        logger_print(f"--dtype auto -> {dtype} on {jax.devices()[0].platform}")
    if dtype == "bf16":
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST

    sde = build_sde(
        config.training.sde,
        beta_min=config.model.beta_min, beta_max=config.model.beta_max,
        sigma_min=config.model.sigma_min, sigma_max=config.model.sigma_max,
        n=config.model.num_scales, t_max=config.model.t,
    )
    config.sampling.probability_flow = True  # forced (opt_main.py:157)
    sampler = get_sampling_fn(
        config, sde, (config.ZeDO.batch, N_JOINTS, JOINT_DIM),
        lambda x: x, config.ZeDO.sampling_eps,
    )
    zcfg = pipeline.ZeDOConfig.from_config(config)

    cond2d, conf, k = dataset.arrays()
    n = len(cond2d)
    if args.strict_batch:
        assert config.ZeDO.batch == n, f"batch: {config.ZeDO.batch}, dataset len: {n}"

    mesh = default_mesh()
    n_dev = mesh.devices.size
    (padded, mask) = shard_lib.pad_batch(
        {"cond2d": cond2d, "conf": conf, "k": k}, n_dev
    )

    sample_poses = np.asarray(sample_poses, np.float32).reshape(-1, N_JOINTS, JOINT_DIM)
    if len(sample_poses) < args.hypo:
        raise ValueError(
            f"cluster file provides {len(sample_poses)} poses but --hypo={args.hypo}"
        )
    clusters = jnp.asarray(sample_poses[: args.hypo])

    import contextlib

    from zedo_tpu.utils import profiling

    profile_dir = getattr(args, "profile", None)
    profile_cm = (profiling.trace(profile_dir) if profile_dir
                  else contextlib.nullcontext())
    t0 = time.time()
    with profile_cm:
        result = pipeline.solve_sharded(
            mesh, params, model_cfg, sde, sampler, zcfg,
            clusters,
            jnp.asarray(padded["cond2d"]),
            jnp.asarray(padded["conf"]) if padded["conf"] is not None else None,
            jnp.asarray(padded["k"]),
            rng=jax.random.PRNGKey(args.seed),
            precision=precision,
            row_mask=mask,  # no-op unless ZeDO.track_reproj is overridden on
        )
        poses = np.asarray(result.poses)
    elapsed = time.time() - t0
    if profile_dir:
        logger_print(f"device trace written to {profile_dir}")
    poses = shard_lib.unpad(poses, mask)
    logger_print(
        f"solved {n} poses x {args.hypo} hypotheses x "
        f"{zcfg.oil.iterations} OIL steps on {n_dev} device(s) in {elapsed:.2f}s "
        f"({n * args.hypo / elapsed:.1f} poses/s)"
    )
    return poses  # [N, S, j, 3]


def main(args):
    config = FLAGS.config
    from zedo_tpu.utils.config import apply_overrides, enable_compilation_cache

    enable_compilation_cache()
    apply_overrides(config, getattr(args, "override", []))
    dataset = build_dataset(config, args)
    batch_results = run_pipeline(config, args, dataset)
    if args.save:
        np.save(args.save, batch_results)
    print("eval...")
    dataset.eval_multi(batch_results, protocol2=False, print_verbose=True)
    dataset.eval_multi(batch_results, protocol2=True, print_verbose=True)


if __name__ == "__main__":
    app.run(main, flags_parser=parse_args)
