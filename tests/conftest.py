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

import json  # noqa: E402

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-lane split (VERDICT r3 item 3): auto-mark tests as `slow` from the
    measured-duration manifest (tests/durations.json) so `-m 'not slow'` is a
    real smoke lane (<3 min) without hand-maintaining dozens of decorators.

    Rules: a test whose measured total (call+setup+teardown) exceeds
    `threshold_seconds` is slow; every test in `always_slow_files` is slow
    (session-scoped tiny-world training, two-process multihost). Tests with
    no manifest entry (new since the last full run) default to FAST — they
    get measured at the next full-lane run."""
    with open(os.path.join(os.path.dirname(__file__), "durations.json")) as fh:
        manifest = json.load(fh)
    thresh = manifest["threshold_seconds"]
    durs = manifest["tests"]
    always = set(manifest["always_slow_files"])
    for item in items:
        fname = item.nodeid.split("::")[0]
        if fname in always or durs.get(item.nodeid, 0.0) > thresh:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def mesh8():
    from weatherconverter_tpu.parallel.sharding import make_mesh

    return make_mesh()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
