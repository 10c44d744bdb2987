"""Forward/reverse SDEs for score-based diffusion (VP, sub-VP, VE).

TPU-native rebuild of lib/algorithms/advanced/sde_lib.py. SDEs are frozen
dataclasses of static hyperparameters with pure-function methods, so they can
be closed over by jit/scan/vmap with zero tracing overhead; the reverse SDE is
a small wrapper object rather than a dynamically synthesized class
(sde_lib.py:71-109).

Shape conventions match the reference: states x are [..., j, d], times t are
x.shape[:-2] (typically [B]); drift broadcasts diffusion over the trailing two
axes.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

ScoreFn = Callable[..., jax.Array]  # (x, t, condition, mask) -> score


def _bcast(v: jax.Array, x: jax.Array) -> jax.Array:
    """Right-pad `v` with singleton axes to broadcast against `x`."""
    return jnp.reshape(v, v.shape + (1,) * (x.ndim - v.ndim))


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base class; subclasses define drift/diffusion and marginals."""

    n: int = 1000  # discretization steps (reference `N`)
    t_max: float = 1.0  # end time (reference `T`; ZeDO uses 0.1 — opt_main.py:146-148)

    @property
    def T(self) -> float:  # noqa: N802 — reference API name
        return self.t_max

    # -- to implement -------------------------------------------------------
    def sde(self, x, t):
        raise NotImplementedError

    def marginal_prob(self, x, t):
        raise NotImplementedError

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        raise NotImplementedError

    def _prior_sigma(self) -> float:
        """Std of the isotropic-normal prior; VESDE overrides (sigma_max)."""
        return 1.0

    # -- shared -------------------------------------------------------------
    def prior_logp(self, z):
        """Isotropic-normal prior log-density (sde_lib.py:142-149, 201-207,
        244-249 — the three per-class copies collapse to one formula
        parameterized by the prior std)."""
        sigma = self._prior_sigma()
        n_dims = math.prod(z.shape[1:])
        flat = z.reshape(z.shape[0], -1)
        return (-n_dims / 2.0 * math.log(2 * math.pi * sigma**2)
                - jnp.sum(flat**2, axis=-1) / (2 * sigma**2))

    def discretize(self, x, t):
        """Euler-Maruyama discretization: x_{i+1} = x_i + f_i + G_i z_i
        (sde_lib.py:52-69). dt = 1/N regardless of T, as in the reference."""
        dt = 1.0 / self.n
        drift, diffusion = self.sde(x, t)
        f = drift * dt
        g = diffusion * math.sqrt(dt)
        return f, g

    def reverse(self, score_fn: ScoreFn, probability_flow: bool = False) -> "ReverseSDE":
        return ReverseSDE(forward=self, score_fn=score_fn, probability_flow=probability_flow)


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Reverse-time SDE / probability-flow ODE (sde_lib.py:84-109).

    Note the reference multiplies the score term by `1.0 if probability_flow
    else 1.` — i.e. by 1 either way (the textbook 0.5 factor for the ODE case
    is absent, sde_lib.py:97). Reproduced verbatim as the default: the ZeDO
    pipeline was tuned against this dynamics, so "fixing" it silently would
    change published metrics. `score_coeff=0.5` opts into the exact
    probability-flow ODE (e.g. for likelihood computation).
    """

    forward: SDE
    score_fn: ScoreFn
    probability_flow: bool = False
    score_coeff: float = 1.0

    @property
    def n(self) -> int:
        return self.forward.n

    @property
    def T(self) -> float:  # noqa: N802
        return self.forward.T

    def sde(self, x, t, condition=None, mask=None):
        drift, diffusion = self.forward.sde(x, t)
        score = self.score_fn(x, t, condition, mask)
        drift = drift - _bcast(diffusion, x) ** 2 * score * self.score_coeff
        if self.probability_flow:
            diffusion = jnp.zeros_like(diffusion)
        return drift, diffusion

    def discretize(self, x, t, condition=None, mask=None):
        f, g = self.forward.discretize(x, t)
        rev_f = f - _bcast(g, x) ** 2 * self.score_fn(x, t, condition, mask) * self.score_coeff
        rev_g = jnp.zeros_like(g) if self.probability_flow else g
        return rev_f, rev_g


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
    """Variance-preserving (DDPM) SDE (sde_lib.py:112-165)."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    @property
    def discrete_betas(self) -> jax.Array:
        return jnp.linspace(self.beta_min / self.n, self.beta_max / self.n, self.n)

    @property
    def alphas(self) -> jax.Array:
        return 1.0 - self.discrete_betas

    @property
    def alphas_cumprod(self) -> jax.Array:
        return jnp.cumprod(self.alphas)

    @property
    def sqrt_alphas_cumprod(self) -> jax.Array:
        return jnp.sqrt(self.alphas_cumprod)

    @property
    def sqrt_1m_alphas_cumprod(self) -> jax.Array:
        return jnp.sqrt(1.0 - self.alphas_cumprod)

    def sde(self, x, t):
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        drift = -0.5 * _bcast(beta_t, x) * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        mean = _bcast(jnp.exp(log_mean_coeff), x) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        return mean, std

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    def discretize(self, x, t):
        """DDPM discretization (sde_lib.py:157-165)."""
        timestep = (t * (self.n - 1) / self.T).astype(jnp.int32)
        beta = self.discrete_betas[timestep]
        alpha = self.alphas[timestep]
        f = _bcast(jnp.sqrt(alpha), x) * x - x
        g = jnp.sqrt(beta)
        return f, g


@dataclasses.dataclass(frozen=True)
class SubVPSDE(SDE):
    """Sub-VP SDE — the one ZeDO actually runs (sde_lib.py:168-206;
    selected by configs/optim/*.py `training.sde = 'subvpsde'`).

    marginal_prob's `std` is 1 - exp(2*log_mean_coeff) — the VARIANCE-like
    quantity without a square root (sde_lib.py:197). The score network was
    trained against exactly this scaling; keep it."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    @property
    def alphas(self) -> jax.Array:
        """Langevin correctors index `sde.alphas` for sub-VP too
        (sampling.py:272-274); mirror VPSDE's discrete alphas."""
        betas = jnp.linspace(self.beta_min / self.n, self.beta_max / self.n, self.n)
        return 1.0 - betas

    def sde(self, x, t):
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        drift = -0.5 * _bcast(beta_t, x) * x
        discount = 1.0 - jnp.exp(
            -2.0 * self.beta_min * t - (self.beta_max - self.beta_min) * t**2
        )
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        mean = _bcast(jnp.exp(log_mean_coeff), x) * x
        std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
        return mean, std

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding (SMLD/NCSN) SDE (sde_lib.py:209-261)."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0

    @property
    def discrete_sigmas(self) -> jax.Array:
        return jnp.exp(
            jnp.linspace(math.log(self.sigma_min), math.log(self.sigma_max), self.n)
        )

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * math.sqrt(
            2 * (math.log(self.sigma_max) - math.log(self.sigma_min))
        )
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * self.sigma_max

    def _prior_sigma(self) -> float:
        return self.sigma_max

    def discretize(self, x, t):
        """SMLD discretization (sde_lib.py:253-261)."""
        timestep = (t * (self.n - 1) / self.T).astype(jnp.int32)
        sigma = self.discrete_sigmas[timestep]
        adjacent_sigma = jnp.where(
            timestep == 0, jnp.zeros_like(t), self.discrete_sigmas[timestep - 1]
        )
        f = jnp.zeros_like(x)
        g = jnp.sqrt(sigma**2 - adjacent_sigma**2)
        return f, g


def get_ddpm_params(beta_min=0.1, beta_max=20.0, num_scales=1000):
    """Discrete DDPM schedule dict (reference utils.py:669-691).

    The schedule constants are computed in float64 — the reference
    hard-codes np.float64 here — so the 1000-factor cumprod doesn't
    accumulate f32 rounding; only the final arrays convert to f32."""
    num_diffusion_timesteps = 1000
    beta_start = beta_min / num_scales
    beta_end = beta_max / num_scales
    betas64 = np.linspace(beta_start, beta_end, num_diffusion_timesteps,
                          dtype=np.float64)
    alphas64 = 1.0 - betas64
    alphas_cumprod64 = np.cumprod(alphas64)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return {
        "betas": f32(betas64),
        "alphas": f32(alphas64),
        "alphas_cumprod": f32(alphas_cumprod64),
        "sqrt_alphas_cumprod": f32(np.sqrt(alphas_cumprod64)),
        "sqrt_1m_alphas_cumprod": f32(np.sqrt(1.0 - alphas_cumprod64)),
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }


def build_sde(name: str, *, beta_min=0.1, beta_max=20.0, sigma_min=0.01,
              sigma_max=50.0, n=1000, t_max=1.0) -> SDE:
    """Factory matching the entry points' config dispatch (opt_main.py:143-153)."""
    name = name.lower()
    if name == "vpsde":
        return VPSDE(beta_min=beta_min, beta_max=beta_max, n=n, t_max=t_max)
    if name == "subvpsde":
        return SubVPSDE(beta_min=beta_min, beta_max=beta_max, n=n, t_max=t_max)
    if name == "vesde":
        return VESDE(sigma_min=sigma_min, sigma_max=sigma_max, n=n, t_max=t_max)
    raise NotImplementedError(f"SDE {name} unknown.")
