"""Persistent XLA compilation cache setup.

First compile of the 108M train step takes tens of minutes over the axon
TPU tunnel; the persistent cache makes every subsequent process start warm.
Call early (before the first jit execution).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = '/tmp/jax_compile_cache',
                             min_compile_secs: float = 1.0) -> None:
    """``min_compile_secs``: persist programs whose compile took at least
    this long.  The holdout search passes ~0.05: its per-target cost was
    363 sub-second XLA compiles (one-op jnp programs over target-varying
    pool shapes, ~0.9s each over the axon tunnel = 327s/490s of a profiled
    target) — all just under the 1.0s default threshold, so nothing was
    ever persisted and every fresh process recompiled the lot."""
    import jax
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          float(min_compile_secs))
    except Exception:
        pass
