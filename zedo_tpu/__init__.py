"""zedo_tpu: TPU-native zero-shot 3D human pose estimation.

A ground-up JAX/XLA/Pallas framework with the capabilities of
ipl-uw/ZeDO-Release (WACV 2024 "Back to Optimization" + WACVW 2024 infant
follow-up): a score-based diffusion pose prior used inside a camera-ray
optimization loop, multi-hypothesis evaluation, the full dataset/eval layer,
and prior training — redesigned for TPU (vmap over hypotheses, lax.scan over
optimization steps, pjit over device meshes) instead of the reference's
sequential CUDA/PyTorch loops.
"""

__version__ = "0.1.0"
