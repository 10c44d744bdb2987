"""zedo_tpu quickstart: zero-shot 3D pose lifting in three acts.

Runs entirely on the committed demo artifact (tests/fixtures/trained — a
small diffusion prior trained on a synthetic pose family, shipped in the
reference's .pth layout) so it works on a fresh clone with no datasets:

  1. library solve  — load a checkpoint, lift 2D keypoints to 3D with the
                      jitted IPO+OIL pipeline, score against ground truth;
  2. serving API    — the load-once / predict-many ZeDOEstimator, including
                      the characterized low-latency schedule;
  3. CLI pointer    — the same solve through the reference-compatible CLI.

Usage:
  python examples/quickstart.py            # quick schedule (CPU-friendly)
  python examples/quickstart.py --full     # the exact 500/1000 dynamics
Works on any backend; on a TPU the full H36M-scale workload (886x50) runs
in ~3 s (see bench.py / DESIGN.md).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIXTURE = os.path.join(REPO, "tests", "fixtures", "trained")


def mpjpe_mm(pred, gt):
    """Best-hypothesis mean per-joint error: pred [N,S,j,3], gt [N,j,3]."""
    per_hyp = np.linalg.norm(pred - gt[:, None], axis=-1).mean(-1)  # [N,S]
    return float(per_hyp.min(axis=1).mean() * 1000.0)


def main():
    full = "--full" in sys.argv
    n_scenes = 24
    ipo_iters, oil_iters = (500, 1000) if full else (200, 300)

    from zedo_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from zedo_tpu import bench_trained
    from zedo_tpu.diffusion.sampling import PCSampler
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.zeroshot import ipo as ipo_lib
    from zedo_tpu.zeroshot import oil as oil_lib
    from zedo_tpu.zeroshot import pipeline

    print(f"backend: {jax.default_backend()} "
          f"({len(jax.devices())} device(s))\n")

    # ---- 1. library solve ------------------------------------------------
    # A trained prior + 2D detections + camera intrinsics -> 3D poses.
    # load_fixture wraps utils.checkpoint.load_any_checkpoint (.pth or orbax).
    cfg_m, params, family = bench_trained.load_fixture()
    gt, k, px = bench_trained.make_scenes(family, n_scenes)      # held-out
    clusters = bench_trained.make_hypothesis_clusters(family, s=2)

    # short schedules must RE-DISCRETIZE the annealing (sde.n := OIL steps,
    # the serving.with_schedule semantics) — truncating a 1000-step schedule
    # to 300 steps integrates only part of it (DESIGN "Low-latency serving")
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=oil_iters, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig(
        ipo=ipo_lib.IPOConfig(iterations=ipo_iters, keypoint_list=(0, 1, 4),
                              rot_axes="z", t_norm=3.0),
        oil=oil_lib.OILConfig(iterations=oil_iters, sampling_eps=0.01),
    )

    t0 = time.time()
    res = pipeline.solve_jit(params, cfg_m, sde, sampler, zcfg,
                             jnp.asarray(clusters), jnp.asarray(px), None,
                             jnp.asarray(k), rng=jax.random.PRNGKey(0),
                             precision=jax.lax.Precision.HIGHEST)
    pred = np.asarray(res.poses, np.float32)      # [N, S, 17, 3]
    dt = time.time() - t0

    init_mm = mpjpe_mm(np.broadcast_to(clusters[None], pred.shape), gt)
    solved_mm = mpjpe_mm(pred, gt)
    print(f"1. solve_jit: {n_scenes} scenes x {len(clusters)} hypotheses, "
          f"{ipo_iters} IPO + {oil_iters} OIL steps in {dt:.1f}s "
          f"(incl. compile)")
    print(f"   cluster-init error {init_mm:.0f} mm -> solved MPJPE "
          f"{solved_mm:.1f} mm\n")

    # ---- 2. serving API ----------------------------------------------------
    # Load once, predict many times; executables cached per request bucket.
    from zedo_tpu.serving import ZeDOEstimator

    est = ZeDOEstimator.from_torch_checkpoint(
        os.path.join(FIXTURE, "checkpoint", "checkpoint_trained.pth"),
        os.path.join(FIXTURE, "clusters", "h36m_cluster2.npy"),
        config_path=os.path.join(REPO, "examples", "quickstart_config.py"),
        dtype="fp32", batch_bucket=32,
    )
    fast = est.low_latency()    # OIL 200 / IPO 100, characterized +0.4 mm
    t0 = time.time()
    out = fast.predict(px[:8], k[:8])
    dt = time.time() - t0
    best = out["poses"][np.arange(8), out["best"]]     # [8, 17, 3]
    serve_mm = mpjpe_mm(best[:, None], gt[:8])
    print(f"2. ZeDOEstimator.low_latency(): 8-pose request in {dt:.1f}s "
          f"(incl. compile; steady-state p50 is ~50 ms on a v5e)")
    print(f"   best-hypothesis (by on-device reprojection) MPJPE "
          f"{serve_mm:.1f} mm\n")

    # ---- 3. the CLI --------------------------------------------------------
    print("3. same solve through the reference-compatible CLI:\n"
          "   python -m zedo_tpu.run.opt_main "
          "--config examples/quickstart_config.py \\\n"
          "     --ckpt_dir tests/fixtures/trained/checkpoint "
          "--ckpt_name checkpoint_trained.pth \\\n"
          "     --cluster_dir tests/fixtures/trained/clusters "
          "--data_dir tests/fixtures/trained/data --gt --hypo 2\n"
          "   (training: python -m zedo_tpu.run.train_pose_mini --help; "
          "benchmark: python bench.py)")

    assert solved_mm < 0.15 * init_mm, "trained prior should beat the init"
    return 0


if __name__ == "__main__":
    sys.exit(main())
