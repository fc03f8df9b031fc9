"""Persistent XLA compilation cache.

First compiles of the fused OCR programs take minutes behind a remote-
compile TPU link; caching them on disk makes every later process start
warm.  Called by bench.py and every CLI entry point.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/effocr_tpu_xla")


def enable_persistent_cache(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
