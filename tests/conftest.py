"""Test configuration.

In this environment JAX runs on the platform the session provides — a
real TPU chip when available (the `axon` PJRT plugin registered by
sitecustomize overrides ``JAX_PLATFORMS``), CPU otherwise.  Correctness
tests are platform-agnostic and benefit from running on real hardware.

Multi-chip sharding tests need N devices; they re-exec themselves in a
subprocess with the axon plugin disabled and a virtual 8-device CPU
backend (see ``cpu_mesh_env``), the standard way to fake a pod without
hardware.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


def _tpu_healthy(timeout: int = 90) -> bool:
    """Probe the attached accelerator with a tiny op in a subprocess.

    Relay-attached TPUs occasionally degrade to seconds-per-op or hang;
    a sick device would stall the whole suite, so we fall back to the
    virtual CPU mesh instead.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "x = jax.jit(lambda v: v + 1)(jnp.ones(128));"
             "jax.block_until_ready(x); print('HEALTHY')"],
            capture_output=True, text=True, timeout=timeout,
        )
        return "HEALTHY" in r.stdout
    except Exception:
        return False


if os.environ.get("PALLAS_AXON_POOL_IPS") and not _tpu_healthy():
    sys.stderr.write(
        "conftest: TPU probe failed/slow -> running suite on the "
        "virtual 8-device CPU mesh\n"
    )
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    # sitecustomize may have preloaded jax and pinned the platform; the
    # backend is not initialized yet at conftest time, so this sticks
    import jax

    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def cpu_mesh_env(n_devices: int = 8) -> dict:
    """Environment forcing a virtual n-device CPU backend."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the axon plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


def run_in_cpu_mesh(code: str, n_devices: int = 8, timeout: int = 600) -> str:
    """Run a python snippet under the virtual CPU mesh; returns stdout."""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=cpu_mesh_env(n_devices),
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout
