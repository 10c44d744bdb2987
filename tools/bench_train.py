"""Training throughput benchmark: jitted train step (loss + Adam + EMA) for
the full-size ScoreMLP at the reference's default batch sizes, on real
hardware. Run serialized on the single-tenant TPU.

    python tools/bench_train.py [--steps 50] [--bf16] [--rbg]
"""
from __future__ import annotations

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
    import ml_collections

    from zedo_tpu.diffusion import losses as losses_lib
    from zedo_tpu.diffusion.sde import SubVPSDE
    from zedo_tpu.models import score_mlp

    steps = cli_int_arg(sys.argv, "--steps", 50)
    bf16 = "--bf16" in sys.argv
    if "--rbg" in sys.argv:
        # counter-based PRNG: cuts the dropout bit-generation cost
        # (measured 64.9 -> 53.7 ms/step at batch 50k on v5e)
        jax.config.update("jax_default_prng_impl", "rbg")
    cfg = score_mlp.ScoreMLPConfig()  # full-size 1024/512
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)

    conf = ml_collections.ConfigDict()
    conf.optim = ml_collections.ConfigDict(
        dict(optimizer="Adam", lr=2e-4, beta1=0.9, eps=1e-8, warmup=5000,
             grad_clip=1.0, weight_decay=0)
    )
    optimizer = losses_lib.get_optimizer(conf)
    state = losses_lib.init_train_state(params, optimizer, ema_decay=0.9999)
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, n=1000, t_max=1.0)

    def model_apply(p, x, labels, cond, msk, train=False, rng=None):
        return score_mlp.apply(p, cfg, x, labels, cond, msk, train=train,
                               rng=rng)

    if bf16:
        # mixed precision: bf16 forward/backward matmuls, f32 master state
        model_apply = losses_lib.mixed_precision_apply(model_apply)
    step_fn = jax.jit(losses_lib.get_step_fn(
        sde, model_apply, optimizer, train=True, reduce_mean=True))

    rng = np.random.RandomState(0)
    for batch_size in (5000, 50000):  # infant / adult default batches
        data = jnp.asarray(rng.randn(batch_size, 17, 3).astype(np.float32) * 0.3)
        key = jax.random.PRNGKey(1)
        st = state
        st, loss = step_fn(st, key, data, None, None)  # compile
        float(loss)
        t0 = time.time()
        for i in range(steps):
            key, sk = jax.random.split(key)
            st, loss = step_fn(st, sk, data, None, None)
        final = float(loss)  # host materialization fences the stream
        dt = (time.time() - t0) / steps
        assert np.isfinite(final)
        print(
            f"batch {batch_size:>6}: {dt * 1000:7.2f} ms/step  "
            f"{batch_size / dt / 1e6:6.2f}M poses/s  (loss {final:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
