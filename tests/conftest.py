"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native analogue of a fake distributed backend: every sharding /
multi-chip test runs against 8 virtual CPU devices, so the same `jax.sharding`
programs that run on a TPU slice are validated host-side (SURVEY.md §4).
"""
import os

# Force CPU even when the environment pins a TPU platform (JAX_PLATFORMS=axon,
# registered eagerly by a sitecustomize hook that overrides the env var):
# unit tests must be hermetic and fast, and sharding tests need 8 devices.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# fp32 everywhere in tests: parity targets are metric-level (mm)
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

# the env var alone loses to an already-registered PJRT plugin; the config
# knob wins as long as no backend has been used yet
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; a TPU backend grabbed the process first"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _seed_torch():
    """Pin torch's global RNG per test: several oracles build unseeded torch
    modules, so without this their weights — and hence golden-test tolerances
    — depend on which tests ran before (observed as an order-dependent flake
    in test_full_pth_checkpoint_roundtrip)."""
    try:
        import torch
    except ImportError:  # golden-fixture parity mode runs without torch
        return

    torch.manual_seed(0)
