"""ZeDO-i infant evaluation CLI (reference run/opt_main_infant.py).

Flags --control/--cond select the ControlNet adapter or the conditional
variant (opt_main_infant.py:122-148). The reference's `model_cond` module is
missing from its repo (SURVEY §2.2); --cond maps to the reconstructed
`score_mlp_cond` — note the reference zeroes the condition inside the OIL
sampler call (opt_main_infant.py:327 `condition=condition*0`), so at
inference the cond model runs with a zero condition, whose cond-path
contributions are still part of the forward. Pipeline deltas vs opt_main
live in zedo_tpu/zeroshot/infant.py.
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

JOINT_DIM = 3
HIDDEN_DIM = 1024
EMBED_DIM = 512


def parse_args(argv):
    parser = argparse_flags.ArgumentParser(description="valid score model")
    parser.add_argument("--ckpt_dir", type=str)
    parser.add_argument("--ckpt_name", type=str)
    parser.add_argument("--gt", action="store_true", default=False,
                        help="parsed-but-inert, as in the reference (its "
                             "get_dataloader hard-codes gt2d=True, "
                             "opt_main_infant.py:85-114; the infant sets "
                             "ship no detected-2D files)")
    parser.add_argument("--hypo", type=int, default=1)
    parser.add_argument("--control", default=False, action="store_true")
    parser.add_argument("--cond", default=False, action="store_true")
    parser.add_argument("--dtype", type=str, default="auto",
                        choices=["auto", "fp32", "bf16"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cluster_path", type=str, default=None,
                        help="cluster npy (default mini_cluster_{hypo}.npy)")
    parser.add_argument("--save", type=str, default=None)
    parser.add_argument("--override", action="append", default=[],
                        help="config override, e.g. --override ZeDO.OIL_iterations=500")
    return parser.parse_args(argv[1:])


def get_datasets(config):
    from zedo_tpu.data import mini_rgbd, syrip

    if config.data.dataset == "mini":
        train = mini_rgbd("train", gt2d=True, read_confidence=False,
                          sample_interval=1, num_joint=17)
        test = mini_rgbd("validate", gt2d=True, read_confidence=False,
                         sample_interval=1, num_joint=17)
    elif config.data.dataset == "syrip":
        train = syrip("train", gt2d=True, read_confidence=False,
                      sample_interval=1, num_joint=12)
        test = syrip("validate", gt2d=True, read_confidence=False,
                     sample_interval=1, num_joint=12)
    else:
        raise ValueError(config.data.dataset)
    return train, test


def main(args):
    from zedo_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from zedo_tpu.data.mini_rgbd import MINI_K, SMIL_TO_H36M
    from zedo_tpu.diffusion.sampling import get_sampling_fn
    from zedo_tpu.diffusion.sde import build_sde
    from zedo_tpu.models import control_mlp, score_mlp, score_mlp_cond
    from zedo_tpu.models.registry import make_mlp_config
    from zedo_tpu.zeroshot import infant, pipeline

    config = FLAGS.config
    from zedo_tpu.utils.config import apply_overrides

    apply_overrides(config, getattr(args, "override", []))
    n_joints = config.DATASET.NUM_JOINT
    train_dataset, test_dataset = get_datasets(config)

    model_cfg = make_mlp_config(
        config, n_joints=n_joints, joint_dim=JOINT_DIM,
        hidden_dim=HIDDEN_DIM, embed_dim=EMBED_DIM,
    )
    if args.control:
        model_apply = control_mlp.apply
    elif args.cond:
        model_apply = score_mlp_cond.apply
    else:
        model_apply = score_mlp.apply

    from zedo_tpu.utils.checkpoint import load_any_checkpoint

    ckpt_path = os.path.join(args.ckpt_dir, args.ckpt_name)
    print(f"loading model from {ckpt_path}")
    # .pth OR orbax-native (so adapters trained by run.train_pose_mini
    # --model control/cond load directly without a conversion step)
    params, step = load_any_checkpoint(ckpt_path, model_cfg)
    print(f"=> loaded checkpoint '{ckpt_path}' (step {step})")

    sde = build_sde(
        config.training.sde,
        beta_min=config.model.beta_min, beta_max=config.model.beta_max,
        sigma_min=config.model.sigma_min, sigma_max=config.model.sigma_max,
        n=config.model.num_scales, t_max=config.model.t,
    )
    config.sampling.probability_flow = True
    sampler = get_sampling_fn(
        config, sde, (config.ZeDO.batch, n_joints, JOINT_DIM),
        lambda x: x, config.ZeDO.sampling_eps,
    )
    zcfg = pipeline.ZeDOConfig.from_config(config)

    gt_2d = test_dataset.db_2d
    cond2d = np.asarray(gt_2d[:, :, :2], np.float32)

    if config.data.dataset == "mini":
        # fixed Kinect intrinsics (opt_main_infant.py:223-233)
        k = np.zeros((len(cond2d), 3, 3), np.float32)
        k[:, 0, 0], k[:, 1, 1] = MINI_K["fx"], MINI_K["fy"]
        k[:, 0, 2], k[:, 1, 2] = MINI_K["cx"], MINI_K["cy"]
        k[:, 2, 2] = 1
        pelvis_mode = "joint0"
        # cluster from mini_cluster_{N}.npy, remapped to H36M joints
        # (opt_main_infant.py:242-248)
        cluster_path = args.cluster_path or f"mini_cluster_{args.hypo}.npy"
        sample_poses = np.load(cluster_path)
        sample_poses = sample_poses[0][SMIL_TO_H36M].reshape(-1, 17, 3)
    else:
        k = np.asarray(test_dataset.K, np.float32)
        pelvis_mode = "mean03"
        # cluster = first train sample (opt_main_infant.py:237-240)
        sample_poses = train_dataset.db_3d[0:1]

    sample_poses = np.asarray(sample_poses, np.float32)
    if len(sample_poses) < args.hypo:
        # the reference reruns the SAME single cluster per hypothesis
        # (opt_main_infant.py:245-253 never indexes by sid); replicate that
        # semantics explicitly rather than silently truncating
        print(f"note: cluster source has {len(sample_poses)} pose(s); "
              f"tiling to {args.hypo} identical hypotheses")
        reps = -(-args.hypo // len(sample_poses))
        sample_poses = np.tile(sample_poses, (reps, 1, 1))
    clusters = jnp.asarray(sample_poses[: args.hypo], jnp.float32)
    from zedo_tpu.utils.config import resolve_dtype

    dtype = resolve_dtype(args.dtype)
    if dtype == "bf16":
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST

    # per-step reprojection diagnostic (reference opt_main_infant.py:306-308
    # logs it every OIL iteration); carried out of the scan at zero host-sync
    # cost and summarized below
    import dataclasses

    zcfg = dataclasses.replace(
        zcfg, oil=dataclasses.replace(zcfg.oil, track_reproj=True))

    cond_extra = None
    if args.cond:
        # condition the conditional model on the ACTUAL normalized 2D
        # keypoints at every OIL step (the evident intent of --cond — the
        # reference's model_cond module is missing). Leaving condition=None
        # would re-express inside apply to cond = batch.xy, the
        # "strong fake condition" score_mlp_cond's docstring warns about;
        # training (run.train_pose_mini --model cond) conditions on the
        # same ±1 image-frame normalization (data/base.py normalize_data).
        # Passed as a SHARDED operand (not a closure) so the mesh path works.
        from zedo_tpu.data.base import normalize_data

        cond_extra = normalize_data(np.asarray(cond2d, np.float32))

    # device mesh engaged automatically, like the adult CLIs; the per-step
    # reprojection trace crosses shards via one pmean (solve_infant_sharded)
    from zedo_tpu.data import sharding as shard_lib
    from zedo_tpu.parallel.mesh import default_mesh

    mesh = default_mesh()
    padded, pad_mask = shard_lib.pad_batch(
        {"cond2d": cond2d, "k": k, "cond_extra": cond_extra},
        mesh.devices.size)
    result = infant.solve_infant_sharded(
        mesh, params, model_apply, model_cfg, sde, sampler, zcfg,
        clusters, jnp.asarray(padded["cond2d"]), jnp.asarray(padded["k"]),
        pelvis_mode=pelvis_mode, refine_t_from=950,
        rng=jax.random.PRNGKey(args.seed), precision=precision,
        condition=(jnp.asarray(padded["cond_extra"])
                   if cond_extra is not None else None),
        row_mask=pad_mask,  # keep pad rows out of the reproj diagnostic
    )
    batch_results = shard_lib.unpad(np.asarray(result.poses), pad_mask)
    reproj = np.asarray(result.reproj_px)  # [S, steps]
    n_steps = reproj.shape[1]
    marks = sorted({0, n_steps // 4, n_steps // 2, 3 * n_steps // 4, n_steps - 1})
    trace = "  ".join(f"step {i}: {reproj[:, i].mean():.2f}px" for i in marks)
    print(f"reprojection error (mean over {reproj.shape[0]} hypothesis(es)): {trace}")
    # final max bone length (reference tracks it per step but never uses it,
    # opt_main_infant.py:316-320; the final-pose summary is the useful signal)
    mbl = np.asarray(infant.max_bone_length(
        jnp.asarray(batch_results.reshape(-1, *batch_results.shape[2:]))))
    print(f"max bone length (final poses): mean {mbl.mean():.4f}m, "
          f"max {mbl.max():.4f}m")
    if args.save:
        np.save(args.save, batch_results)

    print("eval...")
    test_dataset.eval_multi(batch_results, protocol2=False, print_verbose=False)


if __name__ == "__main__":
    app.run(main, flags_parser=parse_args)
