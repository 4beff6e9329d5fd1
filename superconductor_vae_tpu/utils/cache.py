"""Persistent XLA compilation cache setup.

First compile of the 108M train step takes tens of minutes over the axon
TPU tunnel; the persistent cache makes every subsequent process start warm.
Call early (before the first jit execution).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = '/tmp/jax_compile_cache') -> None:
    import jax
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
