"""Host-platform environment control.

The container boots every Python interpreter through an ``.axon_site``
sitecustomize hook that registers a remote-TPU PJRT plugin *at interpreter
start* — before any user code runs. Once registered, setting
``JAX_PLATFORMS=cpu`` is not enough to get a clean local CPU backend:
"CPU" jit compiles can still route through the remote-compile tunnel (and
a virtual ``--xla_force_host_platform_device_count`` mesh is silently
defeated). Everything that *intends* to run on host CPU — the test suite,
the driver's multi-chip dry run — must therefore either start from a
sanitized environment or re-exec/subprocess into one.

This module is the single place that knows how to build that environment.
"""

from __future__ import annotations

import os
import sys

_MARK = "_XFEATSLAM_CPU_REEXEC"


def cpu_env(n_devices: int = 8, base: dict | None = None) -> dict:
    """A copy of ``base`` (default ``os.environ``) sanitized for a local
    CPU run with ``n_devices`` virtual XLA host devices."""
    env = dict(os.environ if base is None else base)
    # Strip the axon sitecustomize hook from PYTHONPATH and disable its
    # trigger so a fresh interpreter never registers the remote plugin.
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and ".axon_site" not in p]
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if repo_root not in pp:
        pp.append(repo_root)
    env["PYTHONPATH"] = os.pathsep.join(pp)
    for key in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_POOL_SVC_OVERRIDE", "AXON_LOOPBACK_RELAY"):
        env.pop(key, None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env[_MARK] = "1"
    return env


def _interpreter_is_tainted() -> bool:
    """True when the current interpreter may already have the remote PJRT
    plugin registered (axon hook on path) or jax initialized against it."""
    if os.environ.get(_MARK) == "1":
        return False
    if any(".axon_site" in p for p in sys.path):
        return True
    if ".axon_site" in os.environ.get("PYTHONPATH", ""):
        return True
    jax = sys.modules.get("jax")
    if jax is not None and os.environ.get("JAX_PLATFORMS") != "cpu":
        return True
    return False


def ensure_cpu(n_devices: int = 8, argv: list | None = None) -> None:
    """Guarantee the *current process* is a clean CPU interpreter with
    ``n_devices`` virtual devices, re-exec'ing itself once if needed.

    Call before importing jax (e.g. at the top of tests/conftest.py).
    """
    if _interpreter_is_tainted():
        if argv is None and sys.argv and sys.argv[0] in ("-", "-c", ""):
            # stdin/-c scripts cannot be re-exec'd (the source is gone: the
            # child would read empty stdin and silently exit 0). Write the
            # script to a file, or pass argv explicitly.
            raise RuntimeError(
                "ensure_cpu: cannot re-exec a stdin/-c script under the "
                "axon interpreter hook; run from a file instead"
            )
        env = cpu_env(n_devices)
        args = [sys.executable] + (argv if argv is not None else sys.argv)
        os.execve(sys.executable, args, env)
    # Clean interpreter: just make sure the flags are in place before jax
    # imports (no-op if a parent already set them via cpu_env()).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
