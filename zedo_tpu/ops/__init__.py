"""Pure-function numeric kernels (rotation math, cameras, Procrustes, metrics,
ray-gradient field). Everything here is jit/vmap/grad-safe jnp."""
from zedo_tpu.ops import camera, gradient_field, linalg, metrics, procrustes, rotations

__all__ = ["camera", "gradient_field", "linalg", "metrics", "procrustes", "rotations"]
