"""Superconductor family classification (rule-based, host + vectorized).

Capability parity with the reference classifier
(reference: src/superconductor/models/family_classifier.py:28-190): the
14-class `SuperconductorFamily` taxonomy and the element-set decision rules.

TPU twist: alongside the host/string path there is a fully vectorized
``classify_batch`` operating on ``[B, max_elements]`` atomic-number arrays —
pure boolean algebra over element-presence masks, usable inside jit (e.g. for
on-device reward shaping over sampled formulas).
"""

from __future__ import annotations

import enum
from typing import Dict, Optional, Set

import numpy as np

from ..chem.elements import SYMBOL_TO_Z


class SuperconductorFamily(enum.IntEnum):
    NOT_SUPERCONDUCTOR = 0
    BCS_CONVENTIONAL = 1
    CUPRATE_YBCO = 2
    CUPRATE_LSCO = 3
    CUPRATE_BSCCO = 4
    CUPRATE_TBCCO = 5
    CUPRATE_HBCCO = 6
    CUPRATE_OTHER = 7
    IRON_PNICTIDE = 8
    IRON_CHALCOGENIDE = 9
    MGB2_TYPE = 10
    HEAVY_FERMION = 11
    ORGANIC = 12
    OTHER_UNKNOWN = 13


N_FAMILIES = 14

# 14-class -> hierarchical label maps (reference: train_v12_clean.py:367-403)
FINE_TO_COARSE = np.array(
    [-1, 0, 1, 1, 1, 1, 1, 1, 2, 2, 3, 4, 5, 6], dtype=np.int32)
FINE_TO_CUPRATE_SUB = np.array(
    [-1, -1, 0, 1, 2, 3, 4, 5, -1, -1, -1, -1, -1, -1], dtype=np.int32)
FINE_TO_IRON_SUB = np.array(
    [-1, -1, -1, -1, -1, -1, -1, -1, 0, 1, -1, -1, -1, -1], dtype=np.int32)

_HEAVY_FERMION = {'U', 'Ce', 'Yb', 'Pu'}
_ORGANIC = {'C', 'H', 'N', 'S'}


class RuleBasedFamilyClassifier:
    """Element-set decision rules for the 14-class family taxonomy."""

    def classify_from_elements(
        self, elements: Set[str],
        fractions: Optional[Dict[str, float]] = None,
    ) -> SuperconductorFamily:
        if {'Cu', 'O'} <= elements:
            if 'Y' in elements and 'Ba' in elements:
                return SuperconductorFamily.CUPRATE_YBCO
            if 'La' in elements and ('Sr' in elements or 'Ba' in elements):
                return SuperconductorFamily.CUPRATE_LSCO
            if 'Bi' in elements and 'Sr' in elements:
                return SuperconductorFamily.CUPRATE_BSCCO
            if 'Tl' in elements and 'Ba' in elements:
                return SuperconductorFamily.CUPRATE_TBCCO
            if 'Hg' in elements and 'Ba' in elements:
                return SuperconductorFamily.CUPRATE_HBCCO
            return SuperconductorFamily.CUPRATE_OTHER
        if 'Fe' in elements:
            if 'As' in elements or 'P' in elements:
                return SuperconductorFamily.IRON_PNICTIDE
            if 'Se' in elements or 'Te' in elements:
                return SuperconductorFamily.IRON_CHALCOGENIDE
        if 'Mg' in elements and 'B' in elements:
            return SuperconductorFamily.MGB2_TYPE
        if elements & _HEAVY_FERMION:
            return SuperconductorFamily.HEAVY_FERMION
        if 'C' in elements and len(elements & _ORGANIC) / max(len(elements), 1) > 0.5:
            return SuperconductorFamily.ORGANIC
        if len(elements) <= 4:
            return SuperconductorFamily.BCS_CONVENTIONAL
        return SuperconductorFamily.OTHER_UNKNOWN


def _z(sym: str) -> int:
    return SYMBOL_TO_Z[sym]


def classify_batch(element_indices: np.ndarray,
                   element_mask: np.ndarray) -> np.ndarray:
    """Vectorized family classification over ``[B, E]`` atomic numbers.

    Works with numpy or jax.numpy arrays (pure where/boolean ops).
    Returns [B] int32 family ids (assumes all rows ARE superconductors; caller
    overrides non-SC rows with NOT_SUPERCONDUCTOR).
    """
    xp = np  # same ops work for jnp arrays passed in
    b, e = element_indices.shape

    def has(sym):
        return ((element_indices == _z(sym)) & element_mask).any(axis=1)

    n_elem = element_mask.sum(axis=1)
    cu, o = has('Cu'), has('O')
    cuprate = cu & o
    fe = has('Fe')

    out = xp.full(b, int(SuperconductorFamily.OTHER_UNKNOWN), dtype=np.int32)
    out = xp.where(n_elem <= 4, int(SuperconductorFamily.BCS_CONVENTIONAL), out)

    # organic: C present and >50% of distinct elements are in {C,H,N,S}
    organic_count = sum(has(s).astype(np.int32) for s in _ORGANIC)
    organic = has('C') & (organic_count * 2 > n_elem)
    out = xp.where(organic, int(SuperconductorFamily.ORGANIC), out)

    hf = has('U') | has('Ce') | has('Yb') | has('Pu')
    out = xp.where(hf, int(SuperconductorFamily.HEAVY_FERMION), out)

    out = xp.where(has('Mg') & has('B'), int(SuperconductorFamily.MGB2_TYPE), out)

    out = xp.where(fe & (has('Se') | has('Te')),
                   int(SuperconductorFamily.IRON_CHALCOGENIDE), out)
    out = xp.where(fe & (has('As') | has('P')),
                   int(SuperconductorFamily.IRON_PNICTIDE), out)

    out = xp.where(cuprate, int(SuperconductorFamily.CUPRATE_OTHER), out)
    out = xp.where(cuprate & has('Hg') & has('Ba'),
                   int(SuperconductorFamily.CUPRATE_HBCCO), out)
    out = xp.where(cuprate & has('Tl') & has('Ba'),
                   int(SuperconductorFamily.CUPRATE_TBCCO), out)
    out = xp.where(cuprate & has('Bi') & has('Sr'),
                   int(SuperconductorFamily.CUPRATE_BSCCO), out)
    out = xp.where(cuprate & has('La') & (has('Sr') | has('Ba')),
                   int(SuperconductorFamily.CUPRATE_LSCO), out)
    out = xp.where(cuprate & has('Y') & has('Ba'),
                   int(SuperconductorFamily.CUPRATE_YBCO), out)
    return out
