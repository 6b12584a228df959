"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: multi-device tests
via the host-platform device-count override) with x64 enabled so numpy
oracles can be matched to tight tolerances. The TPU bench path
(bench.py / __graft_entry__.py) runs in a separate process and is unaffected.
"""

import os

# Force CPU even when the environment pins JAX_PLATFORMS to a TPU plugin:
# tests must be hermetic and runnable without hardware. The site
# customization in this image registers the TPU backend programmatically,
# so the config update below (not just the env var) is required.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference artifacts not available")
    return REFERENCE_ROOT


@pytest.fixture
def rng():
    return np.random.default_rng(0)
