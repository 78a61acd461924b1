"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is not available in CI; sharding/collective tests fake a mesh
with 8 virtual CPU devices.  Note: in this image the axon TPU plugin forces
``jax_platforms=axon,cpu`` and ignores the JAX_PLATFORMS env var, so the
override must go through jax.config *after* import and *before* any backend
initialisation — this conftest must be the first thing that touches jax.

Real-TPU lane: ``FT8_TPU_TESTS=1 python -m pytest -m tpu`` keeps the axon
platform active and runs only the @pytest.mark.tpu tests (non-interpret
Pallas kernels + one on-chip decode parity case, tests/test_tpu.py).
Without the env var, tpu-marked tests are skipped and everything else runs
on the CPU mesh as before.
"""

import os

import numpy as np
import pytest

import jax

TPU_LANE = bool(os.environ.get("FT8_TPU_TESTS"))

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

from ft8_demodulator_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        return
    skip = pytest.mark.skip(
        reason="real-TPU lane: FT8_TPU_TESTS=1 python -m pytest -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def goldens():
    """Golden fixtures generated once from the reference implementation."""
    path = os.path.join(os.path.dirname(__file__), "goldens", "protocol_goldens.npz")
    return np.load(path)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same fresh stream, so outcomes
    # never depend on which other tests ran first
    return np.random.default_rng(1234)
