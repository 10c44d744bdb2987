"""bf16(+pallas kernel) vs fp32(XLA) end-to-end agreement on real hardware.

Runs the full pipeline (IPO + 1000-step OIL) twice on a synthetic camera
scene and reports how far the two precision paths' final poses and MPJPEs
diverge. Synthetic GT gives an absolute error yardstick in mm.

    python tools/validate_dtype.py [--hypo 4] [--n 886]
"""
from __future__ import annotations

import sys

import numpy as np


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from zedo_tpu.utils.config import cli_int_arg, enable_compilation_cache

    enable_compilation_cache()  # both precision programs persist/reuse
    import jax
    import jax.numpy as jnp

    from zedo_tpu.diffusion.sampling import PCSampler
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp
    from zedo_tpu.ops import camera
    from zedo_tpu.zeroshot import pipeline

    n = cli_int_arg(sys.argv, "--n", 886)
    s = cli_int_arg(sys.argv, "--hypo", 4)

    # NOT bench.build_inputs: this tool's characterized dtype deltas
    # (DESIGN.md "+0.010mm") depend on its own fixture — clusters seeded
    # NEAR the GT poses and a damped output head (below), so the loop
    # converges and the bf16-vs-f32 difference is measured in the
    # operating regime rather than on a diverging solve
    rng = np.random.RandomState(0)
    k = np.zeros((n, 3, 3), np.float32)
    k[:, 0, 0] = k[:, 1, 1] = 1145.0
    k[:, 0, 2] = k[:, 1, 2] = 512.0
    k[:, 2, 2] = 1.0
    gt = rng.randn(n, 17, 3).astype(np.float32) * 0.25
    gt -= gt[:, 0:1]
    t = np.zeros((n, 1, 3), np.float32)
    t[..., 2] = 4.5
    px = np.asarray(camera.project(jnp.asarray(gt + t), jnp.asarray(k)))
    clusters = jnp.asarray(gt[:s] + rng.randn(s, 17, 3).astype(np.float32) * 0.1)

    cfg_m = score_mlp.ScoreMLPConfig()
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg_m)
    # damp the output head: an UNDAMPED random prior makes the optimization
    # diverge (ill-conditioned translation re-solve feeding on garbage score
    # directions — same dynamics as the reference with a random net); a small
    # head mimics a trained score near t->0 and keeps the loop in its
    # operating regime, which is what we want to compare across dtypes.
    params["post_dense"]["weight"] = params["post_dense"]["weight"] * 0.05
    params["post_dense"]["bias"] = params["post_dense"]["bias"] * 0.05
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=0.1)
    sampler = PCSampler(sde=sde, predictor="euler_maruyama", corrector="none",
                        probability_flow=True, denoise=True, eps=0.01)
    zcfg = pipeline.ZeDOConfig()

    def solve(p, precision):
        out = pipeline.solve_jit(
            p, cfg_m, sde, sampler, zcfg, clusters,
            jnp.asarray(px), None, jnp.asarray(k), precision=precision,
        )
        return np.asarray(out.poses, np.float64)

    poses32 = solve(params, jax.lax.Precision.HIGHEST)
    params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    poses16 = solve(params16, None)

    bounded = np.abs(poses32).max(axis=(1, 2, 3)) < 10.0  # sane-scale samples
    gt_b = gt[bounded]

    def mpjpe(p):
        per = np.sqrt(((p - gt_b[:, None]) ** 2).sum(-1)).mean(-1)  # [nb, s]
        return per.min(axis=1).mean() * 1000  # mm, min over hypotheses

    print(f"bounded samples: {bounded.sum()}/{n}")
    delta = np.abs(poses32[bounded] - poses16[bounded])
    print(f"pose |delta| mean: {delta.mean() * 1000:.3f} mm, "
          f"p99: {np.percentile(delta, 99) * 1000:.3f} mm, "
          f"max: {delta.max() * 1000:.3f} mm")
    print(f"MPJPE fp32: {mpjpe(poses32[bounded]):.3f} mm | "
          f"bf16: {mpjpe(poses16[bounded]):.3f} mm | "
          f"diff: {abs(mpjpe(poses32[bounded]) - mpjpe(poses16[bounded])):.4f} mm")


if __name__ == "__main__":
    main()
