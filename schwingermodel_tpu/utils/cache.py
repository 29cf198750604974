"""Persistent XLA compilation cache.

On this platform the first compilation of the HMC trajectory program costs
minutes (remote TPU compile); with the persistent cache it drops to seconds
on every later process. Called by the CLI, the benchmark, and the driver
entry hooks before any jit executes.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "schwingermodel_tpu_xla"
)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("SMTPU_XLA_CACHE", _DEFAULT)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
