"""Runtime utilities: compilation cache, platform selection helpers.

Reference parity: the VkPipelineCache persisted across runs (reference:
src/renderer/renderer.cpp:512-520) maps to JAX's persistent compilation
cache — compiled frame executables are reused across process restarts.
"""

from __future__ import annotations

import os

_cache_enabled = False


def enable_compilation_cache(path: str | None = None):
    """Persist compiled XLA executables across runs (pipeline cache)."""
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    path = path or os.path.join(os.path.expanduser("~"), ".cache", "datum_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _cache_enabled = True


def force_cpu(devices: int = 8):
    """Route JAX to a virtual multi-device CPU platform (testing)."""
    os.environ.setdefault("XLA_FLAGS",
                          f"--xla_force_host_platform_device_count={devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
