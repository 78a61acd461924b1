"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is not available in CI; sharding/collective tests fake a mesh via
XLA's host-platform device-count flag.  These env vars must be set before JAX
initialises its backends, hence the import-order gymnastics here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image pre-sets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def goldens():
    """Golden fixtures generated once from the reference implementation."""
    path = os.path.join(os.path.dirname(__file__), "goldens", "protocol_goldens.npz")
    return np.load(path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
