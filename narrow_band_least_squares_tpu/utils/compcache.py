"""Persistent XLA compilation cache.

First-compile latency for the fused pipeline is substantial (tens of
seconds on TPU; minutes behind remote-compile tunnels).  The pipeline
shapes are static per plan, so executables are perfectly cacheable across
processes — enable JAX's persistent cache once, keyed off an env override.
Called idempotently from pipeline constructors.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.environ.get(
        "NBLS_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nbls_jax_cache"),
    )
    if path.lower() in ("0", "off", "none", "disabled"):
        _enabled = True
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    _enabled = True
