"""JAX runtime configuration shared by all device modules.

Imported for its side effect before any kernel is compiled: enables the
persistent compilation cache so every process after the first reuses
compiled executables (XLA compilation in remote-compile environments can
take minutes per shape).  Users override via the standard JAX env vars.
"""

import os

import jax

_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/rabbitkssd_tpu/jax"),
)
os.makedirs(_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
