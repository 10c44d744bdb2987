"""Score-based diffusion core: SDEs, score wrappers, samplers, losses, EMA."""
from zedo_tpu.diffusion import ema, losses, ode, sampling, score, sde

__all__ = ["ema", "losses", "ode", "sampling", "score", "sde"]
