"""Physics-Z supervision: tie named latent coordinates to physical targets.

Capability parity with the reference ``PhysicsZLoss``
(reference: src/superconductor/losses/z_supervision_loss.py:367-446), compact
jnp form.  Sub-losses:

  comp      — Block 8 coords supervised against the 15 compositional targets
  magpie    — Block 11 (450-512) supervised against a LEARNABLE linear
              projection of the Magpie features, trained jointly with the
              encoder exactly as the reference's ``MagpieEncodingLoss``
              (reference: src/superconductor/losses/z_supervision_loss.py:52-76
              — an ``nn.Linear(magpie_dim, 62)`` inside the loss module).
              Init with ``init_magpie_proj`` and pass the params via
              ``proj_params``; with ``proj_params=None`` a deterministic
              seeded isometry is used instead (parameter-free fallback for
              eval/analysis paths that carry no loss-module state)
  thermo    — z[TC] consistency with the normalized input Tc, transition
              width non-negativity
  gl/bcs    — internal consistency: kappa ~ lambda_L/xi, Hc2 >= Hc1,
              gap ratio soft-anchored at the BCS value
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import physics_z as PZ


@dataclasses.dataclass(frozen=True)
class PhysicsZConfig:
    comp_weight: float = 1.0
    magpie_weight: float = 0.5
    consistency_weight: float = 0.1
    new_consistency_weight: float = 0.05


def _magpie_projection(magpie_dim: int, out_dim: int = 62) -> np.ndarray:
    """Deterministic near-isometric projection magpie -> Block 11 coords."""
    rng = np.random.default_rng(1234)
    m = rng.normal(0, 1, (magpie_dim, out_dim)).astype(np.float32)
    # unit-norm columns for a stable target scale (true orthonormality is
    # impossible when out_dim > magpie_dim)
    m /= np.linalg.norm(m, axis=0, keepdims=True) + 1e-8
    return m


_PROJ_CACHE: Dict[int, np.ndarray] = {}


def init_magpie_proj(rng, magpie_dim: int, out_dim: int = 62) -> Dict[str, jnp.ndarray]:
    """Learnable Linear(magpie_dim -> out_dim) params.

    Matches torch ``nn.Linear`` default init (kaiming-uniform weight, uniform
    bias, both bounded by 1/sqrt(fan_in)) so converted reference checkpoints
    and fresh runs start from the same distribution.
    """
    bound = 1.0 / float(np.sqrt(magpie_dim))
    k1, k2 = jax.random.split(rng)
    return {
        'kernel': jax.random.uniform(
            k1, (magpie_dim, out_dim), jnp.float32, -bound, bound),
        'bias': jax.random.uniform(
            k2, (out_dim,), jnp.float32, -bound, bound),
    }


def physics_z_loss(
    z: jnp.ndarray,                 # [B, 2048]
    comp_targets: jnp.ndarray,      # [B, 15] normalized
    magpie: jnp.ndarray,            # [B, M] normalized
    tc_normalized: jnp.ndarray,     # [B]
    cfg: PhysicsZConfig = PhysicsZConfig(),
    proj_params: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    coords = jnp.asarray(PZ.COMP_COORDS)
    z_comp = z[:, coords]                                   # [B, 15]
    comp = ((z_comp - comp_targets) ** 2).mean()

    start, end = PZ.block('magpie')
    if proj_params is not None:
        # learnable projection, trained jointly (reference parity)
        target = magpie @ proj_params['kernel'] + proj_params['bias']
    else:
        m_dim = magpie.shape[1]
        if m_dim not in _PROJ_CACHE:
            _PROJ_CACHE[m_dim] = _magpie_projection(m_dim)
        target = magpie @ jnp.asarray(_PROJ_CACHE[m_dim])   # [B, 62]
    mag = ((z[:, start:end] - target) ** 2).mean()

    # thermodynamic: z[TC] tracks normalized Tc; transition width >= 0
    thermo = ((z[:, PZ.TC] - tc_normalized) ** 2).mean()
    thermo = thermo + jnp.clip(-z[:, PZ.DELTA_TC], 0.0).mean()

    # GL/BCS internal consistency (soft)
    kappa, lam, xi = z[:, PZ.KAPPA], z[:, PZ.LAMBDA_L], z[:, PZ.XI]
    gl = ((kappa - (lam - xi)) ** 2).mean()      # log-space proxy: k = l - x
    hc_order = jnp.clip(z[:, PZ.HC1] - z[:, PZ.HC2], 0.0).mean()
    gap = ((z[:, PZ.GAP_RATIO]) ** 2).mean() * 0.1  # anchored near 0 (normed BCS)
    consistency = gl + hc_order + gap

    total = (cfg.comp_weight * comp + cfg.magpie_weight * mag
             + cfg.consistency_weight * consistency
             + cfg.new_consistency_weight * thermo)
    return {
        'total': total, 'comp': comp, 'magpie': mag,
        'thermo': thermo, 'consistency': consistency,
    }
