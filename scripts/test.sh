#!/usr/bin/env bash
# Run the test suite on a hermetic 8-device virtual CPU mesh.
#
# IMPORTANT: this image's sitecustomize.py (PYTHONPATH=/root/.axon_site) eagerly
# registers the remote-TPU PJRT plugin at interpreter startup when
# PALLAS_AXON_POOL_IPS is set, which (a) overrides JAX_PLATFORMS=cpu and
# (b) routes every XLA compile through a slow remote relay (~100s/compile).
# Clearing PALLAS_AXON_POOL_IPS disables the hook so tests run locally.
set -euo pipefail
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ "$@"
