"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is not available in CI; sharding/collective tests fake a mesh
with 8 virtual CPU devices.  Note: in this image the axon TPU plugin forces
``jax_platforms=axon,cpu`` and ignores the JAX_PLATFORMS env var, so the
override must go through jax.config *after* import and *before* any backend
initialisation — this conftest must be the first thing that touches jax.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def goldens():
    """Golden fixtures generated once from the reference implementation."""
    import os
    path = os.path.join(os.path.dirname(__file__), "goldens", "protocol_goldens.npz")
    return np.load(path)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same fresh stream, so outcomes
    # never depend on which other tests ran first
    return np.random.default_rng(1234)
