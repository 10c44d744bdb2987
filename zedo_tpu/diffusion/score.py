"""Score-function wrappers: turn a raw denoiser into a time-dependent score.

Rebuild of `get_score_fn` / `get_model_fn` (lib/algorithms/advanced/utils.py:
703-800). In JAX there is no train/eval module state — `train` selects dropout
behavior explicitly and the returned function is pure.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from zedo_tpu.diffusion.sde import SDE, SubVPSDE, VESDE, VPSDE, _bcast

# model_fn(x, labels, condition, mask) -> raw network output
ModelFn = Callable[..., jax.Array]

CONTINUOUS_LABEL_SCALE = 999.0  # utils.py:762 "maximum time embedding is 999"


def split_score_fn(sde: SDE, model_fn: ModelFn, continuous: bool = False):
    """get_score_fn split into its two halves:

      eval_fn(x, t, condition, mask) -> raw network output (the expensive
        part — one NFE), and
      score_from_out(out, x, t)      -> true score (the cheap per-step std
        refresh).

    Callers that cache the network output across adjacent timesteps
    (OILConfig.score_reuse on the generic path) re-run only score_from_out
    each step, so the reused output is still divided by the CURRENT std —
    exactly the fast path's decomposition (oil._run_oil_fast carries the raw
    model output, not the score)."""
    if isinstance(sde, (VPSDE, SubVPSDE)):

        def eval_fn(x, t, condition=None, mask=None):
            if continuous or isinstance(sde, SubVPSDE):
                labels = t * CONTINUOUS_LABEL_SCALE
            else:
                labels = t * (sde.n - 1)
            return model_fn(x, labels, condition, mask)

        def score_from_out(out, x, t):
            if continuous or isinstance(sde, SubVPSDE):
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = t * (sde.n - 1)
                std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
            return -out / _bcast(std, x)

    elif isinstance(sde, VESDE):

        def eval_fn(x, t, condition=None, mask=None):
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = jnp.round((sde.T - t) * (sde.n - 1)).astype(jnp.int32)
            return model_fn(x, labels, condition, mask)

        def score_from_out(out, x, t):
            return out  # VE models output the score directly (utils.py:779-795)

    else:
        raise NotImplementedError(f"SDE class {type(sde).__name__} not supported.")

    return eval_fn, score_from_out


def get_score_fn(sde: SDE, model_fn: ModelFn, continuous: bool = False):
    """Wrap `model_fn` so its output is a true score (utils.py:736-800).

    VP/sub-VP continuous: labels = t*999, score = -model(x, labels)/std with
    std = marginal_prob(0, t)[1] (for sub-VP that std is 1 - exp(2*lmc),
    unsquare-rooted — sde.py docstring).
    """
    eval_fn, score_from_out = split_score_fn(sde, model_fn, continuous)

    def score_fn(x, t, condition=None, mask=None):
        return score_from_out(eval_fn(x, t, condition, mask), x, t)

    return score_fn
