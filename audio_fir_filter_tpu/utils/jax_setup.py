"""One-time JAX configuration for the framework.

Enables the persistent compilation cache: the unrolled Stockham FFT graphs
(ops/fft_core.py) take minutes to compile on the TPU backend the first
time; with the cache, every later process reuses the compiled executable.
Idempotent and safe to call from multiple entry points.
"""

from __future__ import annotations

import os

_configured = False


def configure_jax() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    cache_dir = os.environ.get(
        "LOWCUT_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lowcut_jax_cache"),
    )
    if cache_dir and cache_dir != "0":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # cache is an optimization; never fail the pipeline for it
