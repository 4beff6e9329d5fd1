"""Tracing / profiling utilities.

Replaces the reference's CUDA-event ``TimingStats``
(reference: scripts/train_v12_clean.py:128-345) with the JAX-native
equivalents: a phase wall-timer that calls ``block_until_ready`` at phase
boundaries (the honest way to time async dispatch), plus a
``jax.profiler`` trace context manager for XLA-level timelines viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Named-phase wall timing with optional device synchronization.

    Usage:
        timer = PhaseTimer()
        with timer.phase('data_load'):
            batch = next(it)
        with timer.phase('train_step', sync=metrics['total']):
            state, metrics = step(state, batch, rng, dyn)
        print(timer.summary())
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        lines = [f'  {name:<18} {t:8.3f}s  {t / total:6.1%}  '
                 f'({self.counts[name]}x, {t / max(self.counts[name], 1) * 1e3:.1f}ms avg)'
                 for name, t in rows]
        return 'phase timing:\n' + '\n'.join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def trace_context(logdir: str = '/tmp/jax_trace',
                  enabled: bool = True):
    """XLA profiler trace (open in TensorBoard / Perfetto)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def named_scope(name: str):
    """Annotate a region in the profiler timeline."""
    with jax.named_scope(name):
        yield
