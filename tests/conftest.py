"""Shared test fixtures.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the env vars must be set before JAX import).
Mirrors the reference's fixture strategy (``/root/reference/tests/conftest.py``):
tiny seeded synthetic networks, no mocks — everything runs the real code.
"""

import os

# Force assignment (not setdefault): the host environment pins
# JAX_PLATFORMS to the TPU plugin at interpreter startup, and tests must run
# on the virtual CPU mesh.  Set TAME_TEST_TPU=1 to run the suite on real TPU.
if not os.environ.get("TAME_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The TPU plugin registers itself regardless of JAX_PLATFORMS; the config
# update is what actually pins the platform.
if not os.environ.get("TAME_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache, keyed per host CPU: XLA:CPU AOT blobs
# embed the build host's feature set and can SIGILL/segfault when loaded
# on a different machine (tame/utils/cache.py).
from tame.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax)

from tame.models import StaticAMEModel, TemporalAMEModel  # noqa: E402


@pytest.fixture
def seed():
    return 42


@pytest.fixture
def small_network_params():
    return {"n_nodes": 10, "latent_dim": 2, "seed": 42}


@pytest.fixture
def temporal_network_params():
    return {"n_nodes": 10, "n_time": 5, "latent_dim": 2,
            "ar_coefficient": 0.8, "seed": 42}


@pytest.fixture
def static_model(small_network_params):
    return StaticAMEModel(**small_network_params)


@pytest.fixture
def temporal_model(temporal_network_params):
    return TemporalAMEModel(**temporal_network_params)


@pytest.fixture
def static_data(static_model):
    Y, A, M = static_model.generate_data(return_latents=True)
    return {"model": static_model, "Y": Y, "A": A, "M": M}


@pytest.fixture
def temporal_data(temporal_model):
    Y, X = temporal_model.generate_data(return_latents=True)
    return {"model": temporal_model, "Y": Y, "X": X}


@pytest.fixture
def mock_history():
    """Hand-written history for diagnostics/plot tests without running
    inference (reference ``conftest.py:81-87``)."""
    return {
        "elbo": [-1000.0, -900.0, -850.0, -830.0, -825.0],
        "reconstruction_error": [0.5, 0.4, 0.35, 0.33, 0.32],
    }


@pytest.fixture
def rng_key(seed):
    return jax.random.PRNGKey(seed)
