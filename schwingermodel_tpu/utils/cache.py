"""Persistent XLA compilation cache.

On this platform the first compilation of the HMC trajectory program costs
minutes (remote TPU compile); with the persistent cache it drops to seconds
on every later process. Called by the CLI, the benchmark, and the driver
entry hooks before any jit executes.
"""

from __future__ import annotations

import hashlib
import os


def _host_key() -> str:
    """Cache subdirectory key tied to this host's CPU capabilities.

    XLA:CPU AOT artifacts embed the compile machine's feature set (AVX512
    variants etc.); loading one on a host missing a feature risks SIGILL
    (cpu_aot_loader warns exactly this). Keying the directory by the CPU
    model + flags keeps caches from different machines separate. TPU
    artifacts are device-versioned by XLA itself, but a per-host key is
    harmless there."""
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        lines = [ln for ln in txt.splitlines()
                 if ln.startswith(("model name", "flags"))]
        sig = lines[0] + (lines[1] if len(lines) > 1 else "")
    except OSError:
        import platform

        sig = platform.processor() or platform.machine()
    return hashlib.sha1(sig.encode()).hexdigest()[:12]


_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "schwingermodel_tpu_xla"
)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    base = path or os.environ.get("SMTPU_XLA_CACHE", _DEFAULT)
    cache_dir = os.path.join(base, _host_key())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
