"""Latent-space analysis: embedding cache + high-Tc cluster discovery.

Capability parity with the reference ``LatentSpaceAnalyzer``
(reference: src/superconductor/generation/latent_analyzer.py:30-402).  The
embedding pass is one jitted batched encoder sweep; clustering stays host
numpy (k-means on a few-thousand-point cache is not a device problem).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import DatasetArrays
from ..models import MaterialsEncoder


@dataclasses.dataclass
class LatentCache:
    z: np.ndarray               # [N, latent]
    tc_pred: np.ndarray         # [N]
    tc_kelvin: np.ndarray       # [N] ground truth Kelvin
    is_sc: np.ndarray
    family: np.ndarray
    formulas: List[str]


def _sq_dists(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """[n, k] squared distances without the [n, k, d] broadcast tensor."""
    return ((x * x).sum(-1)[:, None] + (centers * centers).sum(-1)[None, :]
            - 2.0 * (x @ centers.T))


def _kmeans(x: np.ndarray, k: int, iters: int = 50,
            seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    assign = np.zeros(len(x), np.int32)
    for _ in range(iters):
        d = _sq_dists(x, centers)
        new_assign = d.argmin(1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for c in range(len(centers)):
            sel = assign == c
            if sel.any():
                centers[c] = x[sel].mean(0)
    return assign, centers


class LatentSpaceAnalyzer:
    def __init__(self, encoder: MaterialsEncoder, enc_params):
        self.encoder = encoder
        self.enc_params = enc_params

    def build_cache(self, ds: DatasetArrays, batch_size: int = 512) -> LatentCache:
        # params passed as an argument (closing over them would embed 5M+
        # floats as constants in the compiled program)
        @jax.jit
        def embed(enc_params, batch):
            out = self.encoder.apply(
                enc_params, batch['element_indices'],
                batch['element_fractions'], batch['element_mask'],
                batch['magpie'], batch['tc'])
            return out['z'], out['tc_pred']

        zs, tcs = [], []
        n = len(ds)
        for b in range(0, n, batch_size):
            idx = np.arange(b, min(b + batch_size, n))
            pad = batch_size - len(idx)
            full = np.concatenate([idx, np.zeros(pad, np.int64)]) if pad else idx
            batch = {k: jnp.asarray(v) for k, v in ds.batch(full).items()}
            z, tc = embed(self.enc_params, batch)
            zs.append(np.asarray(z)[: len(idx)])
            tcs.append(np.asarray(tc)[: len(idx)])
        return LatentCache(
            z=np.concatenate(zs), tc_pred=np.concatenate(tcs),
            tc_kelvin=ds.norm_stats.tc_to_kelvin(ds.tc),
            is_sc=ds.is_sc, family=ds.family, formulas=ds.formulas)

    def find_high_tc_clusters(self, cache: LatentCache, k: int = 9,
                              tc_threshold: float = 30.0) -> List[Dict]:
        """K-means over SC latents; rank clusters by mean true Tc."""
        sel = (cache.is_sc == 1)
        z = cache.z[sel]
        tc = cache.tc_kelvin[sel]
        if len(z) < k:
            return []
        assign, centers = _kmeans(z.astype(np.float64), k)
        clusters = []
        for c in range(len(centers)):
            members = assign == c
            if not members.any():
                continue
            clusters.append({
                'center': centers[c].astype(np.float32),
                'n_members': int(members.sum()),
                'mean_tc': float(tc[members].mean()),
                'max_tc': float(tc[members].max()),
                'high_tc': float(tc[members].mean()) >= tc_threshold,
                'member_indices': np.where(sel)[0][members],
            })
        return sorted(clusters, key=lambda c: -c['mean_tc'])
