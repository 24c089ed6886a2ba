"""Test configuration: force an 8-device virtual CPU mesh with fp64.

The multi-device tests emulate the reference's ``mpirun -np P`` single-box
runs (``README.md:31-34``) with a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), and run in fp64 to meet the
reference's ``<= 1e-12`` Frobenius acceptance check natively.

This environment registers a TPU PJRT plugin eagerly from sitecustomize
(which also imports jax), locking the backend before pytest starts; the only
reliable way to get the CPU mesh is to re-exec pytest with a corrected
environment.  The re-exec happens in ``pytest_configure`` with global capture
stopped so the replacement process writes to the real stdout.
"""

import os
import sys

_SENTINEL = "CRP_TPU_TEST_ENV_READY"


def pytest_configure(config):
    if os.environ.get(_SENTINEL) == "1":
        import jax

        jax.config.update("jax_enable_x64", True)
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable eager TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env["JAX_ENABLE_X64"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
