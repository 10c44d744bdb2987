"""Score-network model zoo."""
from zedo_tpu.models import nn, score_mlp

__all__ = ["nn", "score_mlp"]
