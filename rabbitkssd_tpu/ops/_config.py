"""JAX runtime configuration shared by all device modules.

Imported for its side effect before any kernel is compiled: enables the
persistent compilation cache so every process after the first reuses
compiled executables (XLA compilation in remote-compile environments can
take minutes per shape).  Users override via the standard JAX env vars.
"""

import os
import threading

import jax

_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/rabbitkssd_tpu/jax"),
)
os.makedirs(_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Pallas/Mosaic kernels serialize their MLIR (incl. location metadata)
# into the custom_call backend_config, which the cache key hashes but
# cannot scrub.  With the default traceback-in-locations, the kernel's
# PYTHON CALL STACK is part of the key — every distinct caller of the
# same kernel recompiles (~30 s per step on remote-compile relays).
# Dropping frames from MLIR locations makes Pallas programs cacheable
# across entry points; tracebacks on errors are unaffected.
jax.config.update("jax_traceback_in_locations_limit", 0)
# 64-bit hash values (use64 configs) flow through device ops as real
# uint64 arrays; kernels keep hot paths in explicit 32-bit dtypes.
jax.config.update("jax_enable_x64", True)


def _warm_transfer_channel():
    """Touch the device->host path once, off the critical path.

    On relay-attached TPUs the FIRST device->host read of a process
    pays a very large fixed setup cost (minutes); later reads are
    milliseconds.  Warming it in a daemon thread overlaps that cost
    with host-side work (corpus IO, parsing, compiles).
    """
    try:
        import jax.numpy as jnp
        import numpy as np

        x = jax.jit(lambda: jnp.zeros(1 << 15, jnp.int32))()
        np.asarray(x)
    except Exception:
        pass


_warm_thread: threading.Thread | None = None
_warm_lock = threading.Lock()


def start_warm() -> None:
    """Start the transfer-channel warmup in a daemon thread (idempotent).

    NOT started at import: a process that imports jax but exits without
    device work would tear down the interpreter while the thread is in
    native PJRT code (segfault).  Pipelines call this when real device
    work begins — by the time results are read, the channel is warm (or
    the read itself waits on the same one-time setup).
    """
    global _warm_thread
    if os.environ.get("RABBITKSSD_TPU_WARM_XFER", "1") != "1":
        return
    with _warm_lock:
        if _warm_thread is None:
            _warm_thread = threading.Thread(target=_warm_transfer_channel,
                                            daemon=True,
                                            name="kssd-xfer-warmup")
            _warm_thread.start()


def wait_warm(timeout: float | None = None) -> None:
    """Block until the transfer channel warmup finished.

    Call before a timed/latency-sensitive device region: a cold-channel
    read stalls every other device operation behind it, so overlapping
    only helps when there is host-side work to hide it under.
    """
    start_warm()
    if _warm_thread is not None:
        _warm_thread.join(timeout)
