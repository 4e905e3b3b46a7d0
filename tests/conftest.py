"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Per the build contract, multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``); benches use the real TPU outside
of pytest.
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS to the real TPU
# backend (and a sitecustomize may import jax before this conftest runs), and
# TPU matmul default precision would break golden parity.  Backend creation is
# lazy, so updating the config here still wins as long as no array has been
# created yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = os.environ.get("PKTPU_REFERENCE_DATA",
                                "/root/reference/test/data")


def pytest_collection_modifyitems(items):
    """Every test is ``quick`` unless explicitly marked ``full``.

    ``pytest -m quick`` = the bounded core gate (<5 min); ``-m full`` = the
    exhaustive sweeps; no ``-m`` = everything (VERDICT r2 weak #8)."""
    for item in items:
        if item.get_closest_marker("full") is None:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def reference_data_dir():
    """Path to the reference's test fixtures; skip tests if unavailable."""
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
