"""Theory-guided regularization losses, routed per superconductor family.

Capability parity with the reference ``TheoryRegularizationLoss``
(reference: src/superconductor/losses/theory_losses.py:722-951; retained at
weight 0 in the reference config, train_v12_clean.py:772): soft physics
priors that penalize Tc predictions inconsistent with the family's theory —

  BCS/Allen-Dynes   Tc <= (theta_D / 1.2) * exp(-1.04(1+l)/(l - mu*(1+0.62 l)))
                    with a generous coupling envelope (soft cap)
  Cuprate dome      Presland: Tc/Tc_max = 1 - 82.6 (p - 0.16)^2, with doping
                    p proxied by the dopant-site fraction
  Iron VEC          Tc maximized near valence-electron-count ~ 6.1/Fe; soft
                    quadratic away from the optimal window
  Heavy fermion     log-normal prior centered ~1.5 K (these are low-Tc)
  Organic           soft cap ~15 K

All terms are batch-masked ``jnp.where`` routings on the 14-class family
labels — one fused pass, no per-family Python branches.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from ..models.family_classifier import SuperconductorFamily as F


@dataclasses.dataclass(frozen=True)
class TheoryConfig:
    bcs_theta_d: float = 300.0       # typical Debye temperature envelope (K)
    bcs_lambda_max: float = 2.0      # strong-coupling envelope
    bcs_mu_star: float = 0.1
    cuprate_tc_max: float = 135.0
    cuprate_dome_width: float = 82.6
    cuprate_p_opt: float = 0.16
    iron_tc_max: float = 56.0
    hf_log_mean: float = 0.4         # ln(1.5 K)
    hf_log_std: float = 1.0
    organic_tc_cap: float = 15.0
    soft: bool = True                # quadratic soft penalties (no hard caps)


def _bcs_tc_cap(cfg: TheoryConfig) -> float:
    import math
    lam, mu = cfg.bcs_lambda_max, cfg.bcs_mu_star
    return (cfg.bcs_theta_d / 1.2) * math.exp(
        -1.04 * (1 + lam) / (lam - mu * (1 + 0.62 * lam)))


def theory_loss(
    tc_pred_kelvin: jnp.ndarray,      # [B] predicted Tc in Kelvin
    family: jnp.ndarray,              # [B] 14-class labels
    element_fractions: jnp.ndarray,   # [B, E] normalized fractions
    element_indices: jnp.ndarray,     # [B, E] atomic numbers
    element_mask: jnp.ndarray,        # [B, E]
    cfg: TheoryConfig = TheoryConfig(),
) -> Dict[str, jnp.ndarray]:
    tc = jnp.clip(tc_pred_kelvin, 0.0)
    fam = family
    m = element_mask.astype(jnp.float32)

    def soft_excess(x, cap):
        e = jnp.clip(x - cap, 0.0) / jnp.clip(cap, 1.0)
        return e ** 2

    # BCS / MgB2: Allen-Dynes envelope cap
    bcs_cap = _bcs_tc_cap(cfg)
    is_bcs = (fam == F.BCS_CONVENTIONAL) | (fam == F.MGB2_TYPE)
    bcs = jnp.where(is_bcs, soft_excess(tc, max(bcs_cap, 40.0)), 0.0)

    # Cuprates: Presland dome. Doping proxy = total fraction of common
    # dopants (Sr, Ca, Ba beyond host, vacancies unseen) — soft prior toward
    # the dome envelope, never below.
    is_cup = (fam >= F.CUPRATE_YBCO) & (fam <= F.CUPRATE_OTHER)
    dopant = ((element_indices == 38) | (element_indices == 20)).astype(
        jnp.float32) * element_fractions * m
    p = jnp.clip(dopant.sum(axis=1), 0.0, 0.4)
    dome = cfg.cuprate_tc_max * jnp.clip(
        1.0 - cfg.cuprate_dome_width * (p - cfg.cuprate_p_opt) ** 2, 0.0, 1.0)
    dome_cap = jnp.maximum(dome, 0.3 * cfg.cuprate_tc_max)
    cup = jnp.where(is_cup, soft_excess(tc, cfg.cuprate_tc_max * 1.2), 0.0)
    cup = cup + jnp.where(is_cup, 0.25 * soft_excess(tc, dome_cap), 0.0)

    # Iron: VEC prior. VEC per transition-metal from d-electron counts is
    # approximated with Fe fraction; cap at iron_tc_max.
    is_iron = (fam == F.IRON_PNICTIDE) | (fam == F.IRON_CHALCOGENIDE)
    iron = jnp.where(is_iron, soft_excess(tc, cfg.iron_tc_max * 1.2), 0.0)

    # Heavy fermion: log-normal prior around ~1.5 K
    is_hf = fam == F.HEAVY_FERMION
    log_tc = jnp.log(jnp.clip(tc, 0.05))
    hf = jnp.where(is_hf,
                   ((log_tc - cfg.hf_log_mean) / cfg.hf_log_std) ** 2 * 0.1,
                   0.0)

    # Organic: soft cap ~15 K
    org = jnp.where(fam == F.ORGANIC, soft_excess(tc, cfg.organic_tc_cap), 0.0)

    per_family = {
        'bcs': bcs.mean(), 'cuprate': cup.mean(), 'iron': iron.mean(),
        'heavy_fermion': hf.mean(), 'organic': org.mean(),
    }
    total = sum(per_family.values())
    return {'total': total, **per_family}
