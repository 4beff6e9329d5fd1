"""SC constraint zoo: reward modifiers (A1/A4/A7, B1-B8) + differentiable
losses (A3 site occupancy, A6 charge balance).

Capability parity with the reference
(reference: losses/constraint_rewards.py:271-666 and
losses/constraint_zoo.py:22-301), re-designed batch-vectorized: the
reference's A4/A7/B* run per-sample Python loops after ``.cpu()`` transfers;
here every rule is a boolean/one-hot contraction over ``[B, 119]`` element
accumulators so the whole zoo executes inside the jitted RL step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..chem.elements import primary_oxidation_state_table
from .token_stats import (
    element_amounts, element_counts, integer_subscripts,
    stream_has_fraction,
)


@dataclasses.dataclass(frozen=True)
class ConstraintConfig:
    """Penalties (reference defaults: train_v12_clean.py:956-990)."""
    a1_duplicate_penalty: float = -50.0
    a4_stoich_norm_penalty: float = -10.0
    a7_impossible_element_penalty: float = -30.0
    family_enabled: bool = True
    family_confidence: float = 0.8
    b1_ybco_oxygen: float = -40.0
    b2_lsco_sr_doping: float = -40.0
    b3_bscco_ca_cu: float = -40.0
    b4_hg_volatile: float = -30.0
    b5_tl_poison: float = -30.0
    b6_iron_oxygen: float = -30.0
    b7_mgb2_poison: float = -30.0
    b8_a15_ratio: float = -30.0


_MAGNETIC_3D = (25, 26, 27, 28)  # Mn Fe Co Ni


def constraint_rewards(
    sampled: jnp.ndarray,            # [B, T]
    mask: jnp.ndarray,               # [B, T]
    token_to_z: jnp.ndarray,         # [V] tokenizer LUT
    token_value_table: jnp.ndarray,  # [V] tokenizer LUT
    cfg: ConstraintConfig = ConstraintConfig(),
    family_predictions: Optional[jnp.ndarray] = None,  # [B, 14] probs
) -> jnp.ndarray:
    """[B] total constraint reward (non-positive)."""
    mask = mask.astype(jnp.float32)
    amounts = element_amounts(sampled, mask, token_to_z, token_value_table)
    counts = element_counts(sampled, mask, token_to_z)
    present = amounts > 0

    # A1: duplicate element occurrences
    has_dup = (counts > 1.0).any(axis=1)
    pen = has_dup * cfg.a1_duplicate_penalty

    # A4: reducible integer stoichiometry (GCD of all subscripts > 1),
    # only for fraction-free formulas with >= 2 subscripts. Values <= 20 so
    # a shared divisor in 2..20 is equivalent to GCD > 1.
    vals, elem_pos = integer_subscripts(sampled, mask)
    n_subs = elem_pos.sum(axis=1)
    divisors = jnp.arange(2, 21, dtype=jnp.float32)                  # [19]
    divisible = (jnp.mod(vals[..., None], divisors) == 0)            # [B,T,19]
    all_div = jnp.where(elem_pos[..., None], divisible, True).all(axis=1)
    gcd_gt1 = all_div.any(axis=1) & (n_subs >= 2)
    no_frac = ~stream_has_fraction(sampled, mask)
    pen = pen + (gcd_gt1 & no_frac) * cfg.a4_stoich_norm_penalty

    # A7: impossible combinations — forbidden pair (F, Tl); magnetic 3d metal
    # co-occurring with Cu at comparable site fraction
    forbidden = present[:, 9] & present[:, 81]                       # F + Tl
    cu_amt = amounts[:, 29]
    mag_violation = jnp.zeros_like(forbidden)
    for z in _MAGNETIC_3D:
        mag_amt = amounts[:, z]
        mag_violation = mag_violation | (
            (cu_amt > 0) & (mag_amt > 0.02) & (mag_amt > 0.5 * cu_amt))
    pen = pen + (forbidden | mag_violation) * cfg.a7_impossible_element_penalty

    # B1-B8: family-gated physics rules
    if cfg.family_enabled and family_predictions is not None:
        conf = family_predictions.max(axis=1)
        fam = jnp.argmax(family_predictions, axis=1)
        gate = conf >= cfg.family_confidence

        o, sr, ca, cu = amounts[:, 8], amounts[:, 38], amounts[:, 20], amounts[:, 29]
        v_amt, li, c_amt, al = amounts[:, 23], amounts[:, 3], amounts[:, 6], amounts[:, 13]

        fpen = jnp.zeros(sampled.shape[0])
        # B1 YBCO: oxygen below ~6.35
        fpen += jnp.where((fam == 2) & (o > 0) & (o < 6.35), cfg.b1_ybco_oxygen, 0.0)
        # B2 LSCO: Sr doping outside [0.055, 0.27]
        fpen += jnp.where((fam == 3) & present[:, 38]
                          & ((sr < 0.055) | (sr > 0.27)), cfg.b2_lsco_sr_doping, 0.0)
        # B3 BSCCO: |Ca - (Cu - 1)| > 0.3
        fpen += jnp.where((fam == 4) & present[:, 20] & present[:, 29]
                          & (jnp.abs(ca - (cu - 1.0)) > 0.3), cfg.b3_bscco_ca_cu, 0.0)
        # B4 Hg-cuprate: V > 30%
        fpen += jnp.where((fam == 6) & (v_amt > 0.30), cfg.b4_hg_volatile, 0.0)
        # B5 Tl-cuprate: V > 30%, Li > 10%, any magnetic 3d > 10%
        fpen += jnp.where((fam == 5) & (v_amt > 0.30), cfg.b5_tl_poison, 0.0)
        fpen += jnp.where((fam == 5) & (li > 0.10), cfg.b5_tl_poison, 0.0)
        mag10 = jnp.zeros(sampled.shape[0], dtype=bool)
        mag05 = jnp.zeros(sampled.shape[0], dtype=bool)
        for z in _MAGNETIC_3D:
            mag10 = mag10 | (amounts[:, z] > 0.10)
            mag05 = mag05 | (amounts[:, z] > 0.05)
        fpen += jnp.where((fam == 5) & mag10, cfg.b5_tl_poison, 0.0)
        # B6 iron-1111: O present but < 0.7 and != 1.0
        fpen += jnp.where((fam == 8) & present[:, 8] & (o < 0.7) & (o != 1.0),
                          cfg.b6_iron_oxygen, 0.0)
        # B7 MgB2: C > 12.5%, Al > 50%, magnetic 3d > 5%
        fpen += jnp.where((fam == 10) & (c_amt > 0.125), cfg.b7_mgb2_poison, 0.0)
        fpen += jnp.where((fam == 10) & (al > 0.50), cfg.b7_mgb2_poison, 0.0)
        fpen += jnp.where((fam == 10) & mag05, cfg.b7_mgb2_poison, 0.0)
        # B8 A15: (Nb+V) : (Sn+Al+Si+Ge) should be 3:1 +/- 10%
        a_tot = amounts[:, 41] + amounts[:, 23]
        b_tot = amounts[:, 50] + amounts[:, 13] + amounts[:, 14] + amounts[:, 32]
        ratio = a_tot / jnp.clip(b_tot, 1e-6)
        fpen += jnp.where((fam == 1) & (a_tot > 0) & (b_tot > 0)
                          & (jnp.abs(ratio - 3.0) > 0.3), cfg.b8_a15_ratio, 0.0)

        pen = pen + jnp.where(gate & (fpen < 0), fpen, 0.0)

    return pen


# ---------------------------------------------------------------------------
# Differentiable constraints (A3, A6) — operate on encoder composition arrays
# ---------------------------------------------------------------------------

# A3 site definitions: family_id -> (z-membership row, target_sum)
# (reference: constraint_zoo.py:38-71)
_SITE_DEFS = [
    (2, {39, 63, 60, 62, 64, 66, 67, 68, 69, 70, 71, 59, 57}, 1.0),
    (2, {56, 38, 20}, 2.0),
    (3, {57, 38, 20, 56}, 2.0),
    (4, {83, 82}, 2.0),
    (5, {81, 82}, 2.0),
    (6, {80, 81}, 1.0),
    (8, {57, 60, 62, 58, 20, 56}, 1.0),
    (10, {12, 3, 11, 13, 20}, 1.0),
]


def _site_tables():
    membership = np.zeros((len(_SITE_DEFS), 119), np.float32)
    fam_ids = np.zeros(len(_SITE_DEFS), np.int32)
    targets = np.zeros(len(_SITE_DEFS), np.float32)
    for i, (fam, zs, tgt) in enumerate(_SITE_DEFS):
        for z in zs:
            membership[i, z] = 1.0
        fam_ids[i] = fam
        targets[i] = tgt
    return membership, fam_ids, targets


_SITE_MEMBERSHIP, _SITE_FAM, _SITE_TARGET = _site_tables()


def site_occupancy_loss(
    element_indices: jnp.ndarray,    # [B, E] atomic numbers
    element_fractions: jnp.ndarray,  # [B, E] (differentiable)
    element_mask: jnp.ndarray,       # [B, E]
    family_predictions: Optional[jnp.ndarray],  # [B, 14] probs
    confidence_threshold: float = 0.8,
) -> jnp.ndarray:
    """A3: L1 deviation of site-sharing element sums from their target.

    Fully vectorized over the 8 (family, site) rules: per-sample site sums are
    a one-hot contraction; rule applicability is a family/confidence gate.
    NOTE: fractions here are normalized molar fractions while site targets are
    formula-unit sums, so like the reference this acts as a *soft shaping*
    term, not an exact constraint.
    """
    if family_predictions is None:
        return jnp.asarray(0.0)
    probs = jnp.asarray(family_predictions)
    conf = probs.max(axis=1)
    fam = jnp.argmax(probs, axis=1)

    onehot = (jnp.arange(119)[None, None, :]
              == element_indices[..., None]).astype(element_fractions.dtype)
    frac = element_fractions * element_mask.astype(element_fractions.dtype)
    per_z = jnp.einsum('be,bez->bz', frac, onehot)                  # [B, 119]

    membership = jnp.asarray(_SITE_MEMBERSHIP)                      # [S, 119]
    site_sums = per_z @ membership.T                                # [B, S]
    has_site_elem = ((per_z > 0) @ membership.T) > 0                # [B, S]
    applies = ((fam[:, None] == jnp.asarray(_SITE_FAM)[None, :])
               & (conf[:, None] >= confidence_threshold)
               & has_site_elem)
    dev = jnp.abs(site_sums - jnp.asarray(_SITE_TARGET)[None, :])
    n = jnp.clip(applies.sum(), 1)
    return (dev * applies).sum() / n


_OX_TABLE = primary_oxidation_state_table()


def charge_balance_loss(
    element_indices: jnp.ndarray,
    element_fractions: jnp.ndarray,
    element_mask: jnp.ndarray,
    tolerance: float = 0.5,
) -> jnp.ndarray:
    """A6: tanh penalty on |sum(frac * oxidation_state)| above tolerance
    (reference: constraint_zoo.py:234-301)."""
    ox = jnp.asarray(_OX_TABLE)[jnp.clip(element_indices, 0, 118)]
    charge = (element_fractions * ox
              * element_mask.astype(element_fractions.dtype)).sum(axis=1)
    excess = jnp.clip(jnp.abs(charge) - tolerance, 0.0)
    return jnp.tanh(excess).mean()
