"""Latent-space navigation strategies, batched and jit-friendly.

Capability parity with the reference's z-space samplers used by Phase-2 and
holdout search (reference: training/self_supervised.py:182-740 ``slerp`` /
``ZSpaceSampler``; scripts/holdout/holdout_search.py:441-545 strategies):
Gaussian perturbation, SLERP / linear interpolation, centroid walks, PCA
walks, element-anchored neighbor blending, temperature-like scaling — all as
pure array ops over ``[N, latent]`` batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def perturb(z: jnp.ndarray, rng: jax.Array, sigma: float) -> jnp.ndarray:
    """Gaussian perturbation around anchor latents."""
    return z + sigma * jax.random.normal(rng, z.shape, z.dtype)


def slerp(z0: jnp.ndarray, z1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation (batched over leading dims of t).

    Falls back to lerp when the vectors are nearly collinear.
    """
    z0n = z0 / (jnp.linalg.norm(z0, axis=-1, keepdims=True) + 1e-8)
    z1n = z1 / (jnp.linalg.norm(z1, axis=-1, keepdims=True) + 1e-8)
    dot = jnp.clip((z0n * z1n).sum(-1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) else jnp.asarray(t)
    near = jnp.abs(so) < 1e-6
    s0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * omega) / jnp.where(near, 1.0, so))
    s1 = jnp.where(near, t, jnp.sin(t * omega) / jnp.where(near, 1.0, so))
    return s0 * z0 + s1 * z1


def lerp(z0: jnp.ndarray, z1: jnp.ndarray, t) -> jnp.ndarray:
    t = jnp.asarray(t)
    if t.ndim:
        t = t[..., None]
    return (1.0 - t) * z0 + t * z1


def interpolation_sweep(z0: jnp.ndarray, z1: jnp.ndarray, n: int,
                        spherical: bool = True) -> jnp.ndarray:
    """n interpolants between two anchors. [n, latent]."""
    ts = jnp.linspace(0.0, 1.0, n)
    fn = slerp if spherical else lerp
    return jax.vmap(lambda t: fn(z0, z1, t))(ts)


def centroid_walk(z_anchor: jnp.ndarray, centroid: jnp.ndarray,
                  steps: jnp.ndarray) -> jnp.ndarray:
    """Walk from an anchor toward (and past) a cluster centroid."""
    direction = centroid - z_anchor
    return z_anchor[None] + steps[:, None] * direction[None]


def pca_walk(z_anchor: jnp.ndarray, components: jnp.ndarray,
             magnitudes: jnp.ndarray) -> jnp.ndarray:
    """Walk along principal directions. components [K, latent],
    magnitudes [N, K] -> [N, latent]."""
    return z_anchor[None] + magnitudes @ components


def pca_components(z_cache: np.ndarray, k: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k principal directions + explained std of a z cache (host-side)."""
    zc = z_cache - z_cache.mean(axis=0, keepdims=True)
    # SVD on [N, D]: rows of Vt are components
    _, s, vt = np.linalg.svd(zc, full_matrices=False)
    std = s / np.sqrt(max(len(zc) - 1, 1))
    return vt[:k], std[:k]


def element_anchored_blend(
    z_anchor: jnp.ndarray,          # [latent]
    z_neighbors: jnp.ndarray,       # [M, latent] chemically similar anchors
    rng: jax.Array,
    n: int,
    sigma: float = 0.05,
    slerp_fraction: float = 0.3,
) -> jnp.ndarray:
    """Blend an anchor with its element-sharing neighbors + noise
    (reference: self_supervised.py phase-2 strategy 4)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    idx = jax.random.randint(k1, (n,), 0, z_neighbors.shape[0])
    partners = z_neighbors[idx]
    ts = jax.random.uniform(k2, (n,), minval=0.2, maxval=0.8)
    use_slerp = (jnp.arange(n) < int(n * slerp_fraction))
    blended_s = jax.vmap(lambda p, t: slerp(z_anchor, p, t))(partners, ts)
    centroid = z_neighbors.mean(axis=0)
    blended_c = jax.vmap(lambda p, t: lerp((z_anchor + centroid) / 2, p, t))(
        partners, ts)
    blended = jnp.where(use_slerp[:, None], blended_s, blended_c)
    return blended + sigma * jax.random.normal(k3, blended.shape)


def element_jaccard_neighbors(
    element_sets_target: np.ndarray,    # [E] bool presence over Z for target
    element_presence: np.ndarray,       # [N, E] bool presence per dataset row
    k: int = 32,
    min_shared: int = 2,
) -> np.ndarray:
    """Indices of the k most element-similar dataset rows (Jaccard)
    (reference: scripts/holdout/holdout_search_targeted.py:364)."""
    inter = (element_presence & element_sets_target[None]).sum(axis=1)
    union = (element_presence | element_sets_target[None]).sum(axis=1)
    jac = inter / np.maximum(union, 1)
    jac[inter < min_shared] = -1.0
    order = np.argsort(-jac)
    return order[:k][jac[order[:k]] > 0]
