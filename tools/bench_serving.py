"""Serving latency benchmark: ZeDOEstimator.predict p50/p95 on real hardware
across request sizes (single pose -> small batch -> bucket-sized), plus the
opt-in score_reuse=2 latency. Run serialized on the single-tenant TPU.

    python tools/bench_serving.py [--hypo 5] [--reps 9]
    python tools/bench_serving.py --oil 200 --ipo 100 --bucket 32
        # the characterized low-latency preset (ZeDOEstimator.low_latency):
        # re-discretized short schedule, small bucket for N<=32 requests
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from zedo_tpu.utils.config import cli_int_arg, enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import configs.optim.concat_pose_optimization_h36m as h36m_cfg
    from zedo_tpu.diffusion.sampling import PCSampler
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp
    from zedo_tpu.serving import ZeDOEstimator
    from zedo_tpu.zeroshot import pipeline as pipeline_lib

    hypo = cli_int_arg(sys.argv, "--hypo", 5)
    reps = cli_int_arg(sys.argv, "--reps", 9)
    oil_iters = cli_int_arg(sys.argv, "--oil", 0)  # 0 = full 1000-step schedule
    ipo_iters = cli_int_arg(sys.argv, "--ipo", 0)  # 0 = config default (500)
    bucket = cli_int_arg(sys.argv, "--bucket", 256)
    rng = np.random.RandomState(0)

    cfg_m = score_mlp.ScoreMLPConfig()
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        score_mlp.init_params(jax.random.PRNGKey(0), cfg_m),
    )
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    config = h36m_cfg.get_config()
    zcfg = pipeline_lib.ZeDOConfig.from_config(config)
    clusters = (rng.randn(hypo, 17, 3) * 0.25).astype(np.float32)

    from bench import build_inputs

    def scene(n):
        # the shared synthetic pinhole scene (bench.build_inputs) at the
        # request size; conf/clusters from it are unused here
        px, _conf, k, _clusters = build_inputs(n=n, s=1, seed=n)
        return px, k

    for reuse in (1, 2):
        z = zcfg if reuse == 1 else dataclasses.replace(
            zcfg, oil=dataclasses.replace(zcfg.oil, score_reuse=reuse))
        est = ZeDOEstimator(
            params=params, model_cfg=cfg_m, sde=sde, sampler=sampler, zcfg=z,
            clusters=clusters, precision=None, batch_bucket=bucket,
        )
        if oil_iters or ipo_iters:
            # the characterized short schedule (serving.with_schedule:
            # SDE re-discretized so dt = 1/oil_iters); --ipo alone keeps
            # the full 1000-step OIL schedule
            est = est.with_schedule(oil_iters or None,
                                    ipo_iterations=ipo_iters or None)
        for n in (1, 16, 32, 256):
            if n > bucket or (n == 32 and bucket != 32):
                continue
            kp, k = scene(n)
            est.predict(kp, k)  # compile the bucket
            lat = []
            for _ in range(reps):
                t0 = time.time()
                out = est.predict(kp, k)
                lat.append(time.time() - t0)
            lat = np.array(sorted(lat)) * 1000.0
            assert np.isfinite(out["poses"]).all()
            print(
                f"reuse={reuse} N={n:>4} S={hypo}: p50 {np.percentile(lat, 50):8.1f} ms"
                f"  p95 {np.percentile(lat, 95):8.1f} ms"
                f"  ({n / np.percentile(lat, 50) * 1000:.1f} poses/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
