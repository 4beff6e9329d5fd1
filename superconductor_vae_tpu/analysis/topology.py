"""Latent-space topology analysis.

Capability parity with the reference analyzer suite
(reference: src/superconductor/analysis/topology_analyzer.py:123 + 7
sub-analyzers, ~1.5K LoC): intrinsic dimension (MLE + correlation
dimension), kNN density, SC/non-SC boundary metrics, cluster topology
(k-means), PCA spectrum, pairwise-distance statistics — with the two-tier
output (compact JSONL snapshot per call; full per-sample arrays on demand).

Distance computations are batched numpy (a few thousand cached latents);
SVD of the cache is the only heavy op and stays a single LAPACK call.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def _pairwise_sq(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[n, m] squared distances via the |a|^2 + |b|^2 - 2ab identity —
    never materializes an [n, m, d] broadcast tensor (at d=2048 that
    would be terabytes)."""
    a2 = (a * a).sum(-1)[:, None]
    b2 = (b * b).sum(-1)[None, :]
    return np.maximum(a2 + b2 - 2.0 * (a @ b.T), 0.0)


def _knn_distances(x: np.ndarray, k: int, sample: int = 1024,
                   seed: int = 0) -> np.ndarray:
    """[n, k] sorted distances to the k nearest neighbors (subsampled)."""
    rng = np.random.default_rng(seed)
    idx = (rng.choice(len(x), sample, replace=False)
           if len(x) > sample else np.arange(len(x)))
    q = x[idx]
    d2 = _pairwise_sq(q, x)
    d2[np.arange(len(q)), idx] = np.inf  # self
    part = np.partition(d2, k, axis=1)[:, :k]
    return np.sqrt(np.sort(part, axis=1))


def intrinsic_dimension_mle(x: np.ndarray, k: int = 20) -> float:
    """Levina-Bickel MLE intrinsic dimension."""
    d = _knn_distances(x, k)
    d = np.clip(d, 1e-12, None)
    logs = np.log(d[:, -1][:, None] / d[:, :-1])
    inv = logs.mean(axis=1)
    return float(1.0 / np.clip(inv, 1e-12, None).mean())


def correlation_dimension(x: np.ndarray, n_r: int = 10,
                          sample: int = 1024, seed: int = 0) -> float:
    """Grassberger-Procaccia correlation dimension (log-log slope)."""
    rng = np.random.default_rng(seed)
    idx = (rng.choice(len(x), sample, replace=False)
           if len(x) > sample else np.arange(len(x)))
    q = x[idx]
    d = np.sqrt(_pairwise_sq(q, q))
    d = d[np.triu_indices(len(q), 1)]
    d = d[d > 0]
    if len(d) < 10:
        return 0.0
    rs = np.logspace(np.log10(np.percentile(d, 5)),
                     np.log10(np.percentile(d, 50)), n_r)
    counts = np.array([(d < r).mean() for r in rs])
    valid = counts > 0
    if valid.sum() < 3:
        return 0.0
    slope = np.polyfit(np.log(rs[valid]), np.log(counts[valid]), 1)[0]
    return float(slope)


class TopologyAnalyzer:
    def __init__(self, k: int = 20, n_clusters: int = 9,
                 output_dir: Optional[str | Path] = None):
        self.k = k
        self.n_clusters = n_clusters
        self.output_dir = Path(output_dir) if output_dir else None

    def analyze(self, z: np.ndarray, is_sc: Optional[np.ndarray] = None,
                tc_kelvin: Optional[np.ndarray] = None,
                epoch: Optional[int] = None,
                full: bool = False) -> Dict[str, object]:
        z = np.asarray(z, np.float64)
        out: Dict[str, object] = {'n_samples': len(z), 'epoch': epoch,
                                  'time': time.time()}

        # intrinsic dimension
        out['intrinsic_dim_mle'] = intrinsic_dimension_mle(z, self.k)
        out['correlation_dim'] = correlation_dimension(z)

        # density: kNN radius stats
        knn = _knn_distances(z, self.k)
        out['knn_radius_mean'] = float(knn[:, -1].mean())
        out['knn_radius_std'] = float(knn[:, -1].std())

        # PCA spectrum
        zc = z - z.mean(0, keepdims=True)
        s = np.linalg.svd(zc, compute_uv=False)
        var = s ** 2 / max(len(z) - 1, 1)
        ratio = var / var.sum()
        out['pca_var_top8'] = ratio[:8].tolist()
        out['pca_effective_rank'] = float(
            np.exp(-(ratio * np.log(np.clip(ratio, 1e-12, None))).sum()))

        # pairwise distance stats
        rng = np.random.default_rng(0)
        n = min(len(z), 1024)
        sub = z[rng.choice(len(z), n, replace=False)]
        d = np.sqrt(_pairwise_sq(sub, sub))
        tri = d[np.triu_indices(n, 1)]
        out['pairwise_mean'] = float(tri.mean())
        out['pairwise_std'] = float(tri.std())
        out['z_norm_mean'] = float(np.linalg.norm(z, axis=1).mean())

        # SC/non-SC boundary metrics
        if is_sc is not None and (is_sc == 0).any() and (is_sc == 1).any():
            sc_z, non_z = z[is_sc == 1], z[is_sc == 0]
            c_sc, c_non = sc_z.mean(0), non_z.mean(0)
            sep = np.linalg.norm(c_sc - c_non)
            spread = 0.5 * (sc_z.std(0).mean() + non_z.std(0).mean())
            out['sc_boundary_separation'] = float(sep)
            out['sc_boundary_ratio'] = float(sep / max(spread, 1e-8))

        # cluster topology over SC points
        if is_sc is not None and (is_sc == 1).sum() >= self.n_clusters:
            from ..generation.latent_analyzer import _kmeans
            sc_z = z[is_sc == 1]
            assign, centers = _kmeans(sc_z, self.n_clusters)
            sizes = np.bincount(assign, minlength=len(centers))
            out['cluster_sizes'] = sizes.tolist()
            if tc_kelvin is not None:
                tc_sc = tc_kelvin[is_sc == 1]
                out['cluster_mean_tc'] = [
                    float(tc_sc[assign == c].mean()) if (assign == c).any()
                    else 0.0 for c in range(len(centers))]

        if self.output_dir:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            with open(self.output_dir / 'topology_summary.jsonl', 'a') as f:
                f.write(json.dumps(out) + '\n')
            if full:
                np.savez_compressed(
                    self.output_dir / f'topology_full_{epoch or 0}.npz',
                    knn_radius=knn[:, -1], z_norm=np.linalg.norm(z, axis=1))
        return out
