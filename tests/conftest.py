"""Test harness: force an 8-device virtual CPU platform BEFORE jax import so
multi-device mesh/sharding paths are exercised without TPU hardware
(SURVEY.md §4: the reference ships no tests; this suite is the framework's)."""

import os
import sys

# The shell may pin JAX_PLATFORMS=axon (single real TPU chip); tests always
# run on the virtual multi-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# This jax build is patched to default jax_platforms to "axon,cpu" (the real
# TPU tunnel) regardless of JAX_PLATFORMS; force CPU via the config API before
# any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from weatherconverter_tpu.parallel.sharding import make_mesh

    return make_mesh()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
