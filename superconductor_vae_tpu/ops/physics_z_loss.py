"""Physics-Z supervision: tie named latent coordinates to physical targets.

Capability parity with the reference ``PhysicsZLoss``
(reference: src/superconductor/losses/z_supervision_loss.py:367-446), compact
jnp form.  Sub-losses:

  comp      — Block 8 coords supervised against the 15 compositional targets
  magpie    — Block 11 (450-512) supervised against a fixed orthonormal
              random projection of the Magpie features (the reference learns
              this projection inside the loss module; here the projection is
              a deterministic seeded isometry so the loss stays parameter-free
              and checkpoint-independent — documented deviation)
  thermo    — z[TC] consistency with the normalized input Tc, transition
              width non-negativity
  gl/bcs    — internal consistency: kappa ~ lambda_L/xi, Hc2 >= Hc1,
              gap ratio soft-anchored at the BCS value
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

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


def physics_z_loss(
    z: jnp.ndarray,                 # [B, 2048]
    comp_targets: jnp.ndarray,      # [B, 15] normalized
    magpie: jnp.ndarray,            # [B, M] normalized
    tc_normalized: jnp.ndarray,     # [B]
    cfg: PhysicsZConfig = PhysicsZConfig(),
) -> Dict[str, jnp.ndarray]:
    coords = jnp.asarray(PZ.COMP_COORDS)
    z_comp = z[:, coords]                                   # [B, 15]
    comp = ((z_comp - comp_targets) ** 2).mean()

    m_dim = magpie.shape[1]
    if m_dim not in _PROJ_CACHE:
        _PROJ_CACHE[m_dim] = _magpie_projection(m_dim)
    proj = jnp.asarray(_PROJ_CACHE[m_dim])
    start, end = PZ.block('magpie')
    target = magpie @ proj                                  # [B, 62]
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
