"""Process-wide JAX runtime configuration.

Enables the persistent compilation cache so index builds and query kernels
compile once per machine instead of once per process — the TPU analogue of
the reference shipping precompiled binaries.  The cache lives inside the
repo by default (override with EXPANN_TPU_CACHE_DIR; disable with
EXPANN_TPU_NO_CACHE=1).
"""

from __future__ import annotations

import os

_configured = False


def configure() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    if os.environ.get("EXPANN_TPU_NO_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get("EXPANN_TPU_CACHE_DIR")
    if not cache_dir:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        cache_dir = os.path.join(repo_root, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
