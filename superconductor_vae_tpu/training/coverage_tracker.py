"""Z-space coverage tracking for Phase-2 sampling.

Capability parity with the reference ``CoverageTracker``
(reference: src/superconductor/training/coverage_tracker.py:22-475): k-means
(k=64) over the latent cache, exponentially-decayed visit counts, inverse
-visit sampling weights, and per-cluster quality stats.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class CoverageTracker:
    def __init__(self, k: int = 64, temperature: float = 1.0,
                 decay: float = 0.995, seed: int = 0):
        self.k = k
        self.temperature = temperature
        self.decay = decay
        self.seed = seed
        self.centers: Optional[np.ndarray] = None
        self.visits: Optional[np.ndarray] = None
        self.quality: Optional[np.ndarray] = None

    def fit(self, z_cache: np.ndarray, iters: int = 25) -> None:
        rng = np.random.default_rng(self.seed)
        k = min(self.k, len(z_cache))
        centers = z_cache[rng.choice(len(z_cache), k, replace=False)].copy()
        for _ in range(iters):
            assign = self.assign(z_cache, centers)
            for c in range(k):
                sel = assign == c
                if sel.any():
                    centers[c] = z_cache[sel].mean(0)
        self.centers = centers
        self.visits = np.zeros(k)
        self.quality = np.zeros(k)

    @staticmethod
    def assign(z: np.ndarray, centers: Optional[np.ndarray] = None) -> np.ndarray:
        d = ((z * z).sum(-1)[:, None] + (centers * centers).sum(-1)[None, :]
             - 2.0 * (z @ centers.T))
        return d.argmin(1)

    def record_visits(self, z: np.ndarray,
                      quality: Optional[np.ndarray] = None) -> None:
        assert self.centers is not None, 'call fit() first'
        self.visits *= self.decay
        assign = self.assign(z, self.centers)
        for c in assign:
            self.visits[c] += 1
        if quality is not None:
            for c, q in zip(assign, quality):
                self.quality[c] = 0.9 * self.quality[c] + 0.1 * float(q)

    def sampling_weights(self) -> np.ndarray:
        """Per-cluster weights favoring under-visited regions."""
        assert self.visits is not None
        w = 1.0 / (1.0 + self.visits) ** self.temperature
        return w / w.sum()

    def sample_cluster(self, rng: np.random.Generator) -> int:
        return int(rng.choice(len(self.centers), p=self.sampling_weights()))

    def stats(self) -> Dict[str, float]:
        v = self.visits
        return {
            'n_clusters': len(self.centers) if self.centers is not None else 0,
            'visited_fraction': float((v > 0).mean()) if v is not None else 0.0,
            'visit_gini': float(np.abs(v[:, None] - v[None]).mean()
                                / (2 * v.mean() + 1e-8)) if v is not None else 0.0,
        }
