"""Infant-prior training CLI (reference run/train_pose_mini.py).

Flag surface matches the reference (train_pose_mini.py:148-168), with
--fine_tune_ckpt replacing the author's hard-coded local paths
(train_pose_mini.py:278-290).
"""
from __future__ import annotations

import pprint

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
    parser = argparse_flags.ArgumentParser(description="train score model")
    parser.add_argument("--restore_dir", "--restore-dir", type=str, default=None,
                        help="orbax checkpoint to resume from (functional; the "
                             "reference parses but ignores it)")
    parser.add_argument("--sample", type=int, help="sample trainset to reduce data")
    parser.add_argument("--flip", default=False, action="store_true",
                        help="parsed-but-inert, as in the reference (its "
                             "loaders wire flip to --rotflip only, "
                             "train_pose_mini.py:251)")
    parser.add_argument("--rotflip", default=False, action="store_true")
    parser.add_argument("--fine_tune", default=False, action="store_true")
    parser.add_argument("--fine_tune_ckpt", type=str, default=None,
                        help=".pth or orbax checkpoint to fine-tune from")
    parser.add_argument("--name", type=str, default="")
    parser.add_argument("--log_name", type=str)
    parser.add_argument("--aug", default=False, action="store_true")
    parser.add_argument("--scaled", default=False, action="store_true",
                        help="parsed-but-inert, as in the reference")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--compute_dtype", type=str, default="fp32",
                        choices=["fp32", "bf16"],
                        help="bf16 = mixed-precision train step (bf16 MXU "
                             "matmuls, f32 loss/grads/Adam/master weights)")
    parser.add_argument("--prng", type=str, default="auto",
                        choices=["auto", "threefry", "rbg"],
                        help="rbg = hardware counter-based PRNG for the "
                             "dropout/noise draws: +21%% training throughput "
                             "on v5e (threefry bit-generation is 24%% of the "
                             "step at batch 50k — DESIGN.md); draws differ "
                             "from threefry but are statistically equivalent. "
                             "Default 'auto' = rbg on TPU-class backends "
                             "(production speed), threefry elsewhere "
                             "(cross-version-reproducible host runs)")
    parser.add_argument("--model", type=str, default="score",
                        choices=["score", "control", "cond"],
                        help="network to train (mirrors opt_main_infant's "
                             "--control/--cond selection): 'control' trains "
                             "the ControlNet adapter with the trunk frozen "
                             "(reference freeze() semantics, "
                             "control_model.py:224-261; combine with "
                             "--fine_tune to seed the trunk from an adult "
                             "checkpoint); 'cond' trains the conditional "
                             "prior on the dataset's 2D keypoints "
                             "(normalized to the ±1 image frame)")
    parser.add_argument("--mesh", type=str, default="auto",
                        help="device mesh for multi-chip training: auto "
                             "(data-parallel over all chips when >1), off, "
                             "dp[N], or dp[N],tpM (e.g. dp4,tp2). The batch "
                             "is sharded over the data axis; with tp the "
                             "ScoreMLP hidden dim is sharded over the model "
                             "axis (parallel.mesh.tp_shardings). Replaces "
                             "the reference's nn.DataParallel-from-config "
                             "(train_pose_mini.py:269)")
    parser.add_argument("--override", action="append", default=[],
                        help="config override, e.g. --override training.batch_size=256")
    return parser.parse_args(argv[1:])


def build_train_dataset(config, args):
    from pathlib import Path

    from zedo_tpu.data import H36MDataset3D, mini_rgbd, syrip

    name = config.data.dataset
    nj = config.DATASET.NUM_JOINT
    kwargs = dict(gt2d=True, read_confidence=False, sample_interval=args.sample or 1,
                  flip=args.rotflip, rot=args.rotflip, aug=args.aug)
    if name == "h36m":
        # adult-prior training (the reference ships adult checkpoints but no
        # adult training config; the same loop trains it here)
        if args.aug:
            # loud, not silently dropped: --aug means the infant datasets'
            # extra prior rows (aug_mini.npy / syrip prior stitching);
            # h36m has no aug source
            raise SystemExit(
                "--aug is an infant-data option (mini/syrip prior rows); "
                "the h36m reader has no augmentation source")
        return H36MDataset3D(
            Path("data", "h36m"), "train", gt2d=True,
            sample_interval=args.sample or 1, flip=args.rotflip, rot=args.rotflip,
        )
    if name == "mini":
        return mini_rgbd("train", num_joint=17, **kwargs)
    if name == "syrip":
        return syrip("train", num_joint=nj, **kwargs)
    if name in ("syrip_concat", "concate"):
        from zedo_tpu.data.concat import ConcatDataset

        a = mini_rgbd("train", num_joint=nj, **kwargs)
        b = syrip("train", num_joint=nj, **kwargs)
        return ConcatDataset([a, b])
    raise ValueError(name)


def build_eval_dataset(config, args):
    """Held-out split for the per-eval validation metrics
    (trainer: Eval/prior_mahalanobis + Eval/zeroshot_mpjpe_mm). The
    reference builds its validate loader too (train_pose_mini.py:252-254)
    but never scores against it."""
    from pathlib import Path

    from zedo_tpu.data import H36MDataset3D, mini_rgbd, syrip

    name = config.data.dataset
    nj = config.DATASET.NUM_JOINT
    kwargs = dict(gt2d=True, read_confidence=False, sample_interval=1)
    try:
        if name == "h36m":
            # stride 64: the trend metrics cap at 1024 rows, so don't pay
            # the full ~550k-frame test-split load at every training start
            return H36MDataset3D(Path("data", "h36m"), "test", gt2d=True,
                                 sample_interval=64)
        if name == "mini":
            return mini_rgbd("validate", num_joint=17, **kwargs)
        if name == "syrip":
            return syrip("validate", num_joint=nj, **kwargs)
        if name in ("syrip_concat", "concate"):
            # mini's validate split (syrip's "validate" is its test images;
            # one consistent population suffices for the trend metrics)
            return mini_rgbd("validate", num_joint=nj, **kwargs)
    except (FileNotFoundError, NotADirectoryError) as e:
        # ONLY missing files downgrade to training-without-validation;
        # real reader bugs must propagate, not be swallowed
        print(f"note: no held-out split for validation metrics ({e})")
    return None


def main(args):
    config = FLAGS.config
    from zedo_tpu.utils.config import (
        apply_overrides, enable_compilation_cache, resolve_prng,
    )

    enable_compilation_cache()
    if resolve_prng(getattr(args, "prng", "auto")) == "rbg":
        # must precede any PRNGKey creation; affects every key this process
        # derives (dropout, noise, shuffles stay numpy). A run resumes
        # reproducibly only under the same --prng choice.
        import jax

        jax.config.update("jax_default_prng_impl", "rbg")
    apply_overrides(config, getattr(args, "override", []))
    from zedo_tpu.models.registry import make_mlp_config
    from zedo_tpu.train import trainer
    from zedo_tpu.utils.checkpoint import load_torch_checkpoint, restore_native
    from zedo_tpu.utils.generic import create_logger

    logger, final_output_dir, tb_log_dir = create_logger(
        config, "train", folder_name=args.name, log_name=args.log_name
    )
    logger.info(pprint.pformat(config))
    logger.info(pprint.pformat(args))

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(tb_log_dir)
    except Exception:
        writer = None

    if getattr(args, "model", "score") == "cond" and args.aug:
        # the aug rows are PRIOR-ONLY 3D (mini zeroes db_2d entirely, syrip
        # appends 3D rows with no 2D) — conditional training would either
        # crash on the length mismatch or silently condition on constant
        # zeros; refuse before touching any data files
        raise SystemExit(
            "--model cond is incompatible with --aug: augmentation "
            "rows carry no 2D keypoints to condition on")

    from zedo_tpu.parallel.mesh import mesh_from_spec

    mesh = mesh_from_spec(getattr(args, "mesh", "auto"))
    if mesh is not None:
        logger.info(f"training mesh: {dict(mesh.shape)}")
    else:
        logger.info("training mesh: single-device")

    dataset = build_train_dataset(config, args)
    logger.info(f"total train samples: {len(dataset.db_3d)}")

    model_cfg = make_mlp_config(config, n_joints=config.DATASET.NUM_JOINT)

    # network selection (opt_main_infant.py:122-148 --control/--cond,
    # reference training ships only the plain model)
    model_kind = getattr(args, "model", "score")
    model_apply_raw = None  # None -> train_loop default (score_mlp.apply)
    model_init = None
    post_init_fn = None
    freeze_fn = None
    condition_data = None
    if model_kind == "control":
        from zedo_tpu.models import control_mlp

        model_apply_raw = control_mlp.apply
        model_init = control_mlp.init_params
        # init_weight + freeze (control_model.py:224-261): after any
        # fine-tune merge, copy the trunk into the control branch, then
        # train only copy/zc/infant_cond leaves
        post_init_fn = lambda p: control_mlp.init_control_params(p, model_cfg)
        freeze_fn = control_mlp.trainable_mask
        logger.info("ControlNet adapter training: trunk frozen, "
                    "copy/zc/infant_cond trainable (control_model.py:224-261)")
    elif model_kind == "cond":
        import functools

        from zedo_tpu.models import score_mlp_cond
        from zedo_tpu.data.base import normalize_data


        mask_cfg = score_mlp_cond.CondMaskConfig(
            pose_mask_prob=float(config.training.get("cond_pose_mask_prob", 0.0)),
            part_mask_prob=float(config.training.get("cond_part_mask_prob", 0.0)),
            joint_mask_prob=float(config.training.get("cond_joint_mask_prob", 0.0)),
        )
        # condition=None resolves to the train-time dropout null inside
        # apply() itself (score_mlp_cond), so eval sampling and the micro
        # solve are correctly unconditional without a shim here
        model_apply_raw = functools.partial(score_mlp_cond.apply,
                                            mask_cfg=mask_cfg)
        model_init = score_mlp_cond.init_params
        # condition = the dataset's 2D keypoints in the reference's own ±1
        # image-frame normalization (data/base.py normalize_data,
        # h36m.py:66-76) — commensurate with the metre-scale poses
        condition_data = normalize_data(
            np.asarray(dataset.db_2d, np.float32)[..., :2])
        logger.info("conditional-prior training: condition = normalized 2D "
                    f"keypoints {condition_data.shape}, mask_cfg={mask_cfg}")

    fine_tune_params = None
    if args.fine_tune:
        if not args.fine_tune_ckpt:
            raise ValueError("--fine_tune requires --fine_tune_ckpt")
        if args.fine_tune_ckpt.endswith(".pth"):
            fine_tune_params = load_torch_checkpoint(args.fine_tune_ckpt, model_cfg)["params"]
        else:
            fine_tune_params = restore_native(args.fine_tune_ckpt)["params"]

    tcfg = trainer.TrainerConfig(
        n_epochs=args.epochs or trainer.N_EPOCHES,
        data_scale=config.training.data_scale,
        seed=config.seed,
        preemption_ckpt_freq=int(
            config.training.get("snapshot_freq_for_preemption", 0) or 0
        ),
        compute_dtype=getattr(args, "compute_dtype", "fp32"),
    )
    extra = {}
    if model_apply_raw is not None:
        extra.update(model_apply_raw=model_apply_raw, model_init=model_init)
    try:
        trainer.train_loop(
            config, dataset,
            test_dataset=build_eval_dataset(config, args),
            output_dir=final_output_dir,
            model_cfg=model_cfg,
            trainer_cfg=tcfg,
            fine_tune_params=fine_tune_params,
            restore_dir=getattr(args, "restore_dir", None) or None,
            writer=writer,
            logger=logger,
            mesh=mesh,
            post_init_fn=post_init_fn,
            freeze_fn=freeze_fn,
            condition_data=condition_data,
            **extra,
        )
    finally:
        if writer is not None:
            writer.close()
        logger.info(f"End. Final output dir: {final_output_dir}")


if __name__ == "__main__":
    app.run(main, flags_parser=parse_args)
