"""Test configuration.

Sharding tests need a virtual 8-device CPU mesh; the axon TPU harness pins
the default platform before conftest can change it, but the CPU backend is
always registered too — so tests grab ``jax.devices("cpu")`` explicitly
(the ``cpu_devices`` fixture) after forcing the host device count here,
before JAX initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


# Fast host-side files auto-marked `quick` (`pytest -m quick` ≈ 2.5 min on
# the 1-core host vs >10 min full suite) so the full-suite-green discipline
# has a cheap edit-test tier.  Files stay unmarked in-source; membership is
# by module so new tests in these files inherit the marker.
_QUICK_FILES = {
    "test_cli_surface",
    "test_data",
    "test_eval",
    "test_kernels",
    "test_lang",
    "test_nms",
    "test_spell_check",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session", autouse=True)
def _pin_cpu_backend():
    """Run all test computation on the (always-registered) CPU backend:
    deterministic, no contention with TPU jobs, local compiles."""
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    yield


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devices = jax.devices("cpu")
    assert len(devices) >= 8, devices
    return devices[:8]
