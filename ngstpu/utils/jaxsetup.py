"""Process-level JAX setup for CLI tools.

Every `ngstpu` CLI invocation is a fresh process; without a persistent
compilation cache each run would pay full XLA compile latency (tens of
seconds on TPU). We enable jax's persistent cache under
~/.cache/ngstpu/jax (override with NGSTPU_JAX_CACHE_DIR).
"""

from __future__ import annotations

import os
import pathlib

_done = False


def setup_jax_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    cache = os.environ.get("NGSTPU_JAX_CACHE_DIR")
    if cache is None:
        cache = str(pathlib.Path.home() / ".cache" / "ngstpu" / "jax")
    pathlib.Path(cache).mkdir(parents=True, exist_ok=True)
    import sys

    if "jax" not in sys.modules:
        # do NOT import jax just to configure it: host-placement CLI runs
        # never load it, and a cold jax import costs ~1.5s per invocation
        # on this box. jax reads these env vars at import time, so a later
        # lazy import still lands in the persistent cache.
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
        os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
