"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container boots every interpreter through an axon remote-TPU hook that
registers a PJRT plugin at interpreter start — even ``JAX_PLATFORMS=cpu``
runs then route jit compiles through the remote tunnel. When that hook is
detected, ``pytest_configure`` re-execs pytest once with a sanitized
environment (see ``xfeatslam_tpu.utils.env``). Capture is suspended first
so the re-exec'd run writes to the real stdout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xfeatslam_tpu.utils.env import _interpreter_is_tainted, cpu_env  # noqa: E402

if not _interpreter_is_tainted():
    # Clean interpreter: just pin the CPU flags before anything imports jax.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    if not _interpreter_is_tainted():
        return
    # Restore the real stdout/stderr fds before exec'ing, else the child's
    # output lands in this process's capture temp file and vanishes.
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
            capman.stop_global_capturing()
        except Exception:
            pass
    sys.stdout.flush()
    sys.stderr.flush()
    env = cpu_env(8)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"]
              + list(config.invocation_params.args), env)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices():
    import jax

    return jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables and tracing caches after each test module.

    A full-suite run accumulates hundreds of compiled CPU programs in one
    process; past ~170 tests the XLA:CPU compiler segfaults compiling the
    (deep, autodiff) Sim3 pose-graph graph in tests/test_solvers.py —
    deterministically in full-suite order, never in isolation or in any
    short prefix. Modules share almost no jit shapes, so per-module cache
    clearing costs little and keeps the long-lived process off that cliff.
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
