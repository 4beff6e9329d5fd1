"""Composition -> Magpie-style feature vector, pure numpy.

The reference's processed CSVs carry matminer-Magpie columns computed
offline (reference: scripts/ingest_new_datasets.py uses matminer's
ElementProperty featurizer); matminer is not available here, so this module
computes an equivalent fixed-width descriptor from the element property
table in :mod:`superconductor_vae_tpu.chem.elements`:

  * 6 weighted statistics (mean, avg. abs. deviation, min, max, range,
    mode-of-most-abundant) over each of the 11 element properties -> 66
  * stoichiometric descriptors: n_elements, Lp norms (p = 2,3,5,7,10),
    Shannon entropy of the fraction vector -> 7
  * valence-orbital occupation fractions (d- and f-electron share of the
    mean valence count) and mean/max/min atomic number -> 5

Total 78 features per composition.  The training pipeline auto-detects the
Magpie width from the CSV's numeric columns (data/pipeline.py:245), so this
width does not need to match the reference's 145/151-column sets — only to
be informative and consistent within a corpus.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .elements import (N_PROPERTIES, PROPERTY_NAMES, SYMBOL_TO_Z,
                       element_property_matrix)

_STATS = ('mean', 'avg_dev', 'min', 'max', 'range', 'mode')

FEATURE_NAMES: List[str] = (
    [f'magpie_{p}_{s}' for p in PROPERTY_NAMES for s in _STATS]
    + ['n_elements', 'norm_p2', 'norm_p3', 'norm_p5', 'norm_p7', 'norm_p10',
       'frac_entropy']
    + ['d_electron_frac', 'f_electron_frac', 'z_mean', 'z_max', 'z_min']
)
N_FEATURES = len(FEATURE_NAMES)

_VALENCE_COL = PROPERTY_NAMES.index('valence')
_D_COL = PROPERTY_NAMES.index('d_electrons')
_F_COL = PROPERTY_NAMES.index('f_electrons')


def composition_features(comp: Dict[str, float]) -> np.ndarray:
    """[N_FEATURES] float32 descriptor for one {symbol: amount} composition.

    Unknown symbols are dropped; an empty/unknown composition returns zeros.
    """
    props = element_property_matrix(normalize=False)
    zs = np.array([SYMBOL_TO_Z[s] for s in comp if s in SYMBOL_TO_Z],
                  dtype=np.int64)
    amounts = np.array([comp[s] for s in comp if s in SYMBOL_TO_Z],
                       dtype=np.float64)
    if zs.size == 0 or amounts.sum() <= 0:
        return np.zeros((N_FEATURES,), np.float32)
    fracs = amounts / amounts.sum()
    mat = props[zs]                                      # [E, P]

    mean = fracs @ mat
    avg_dev = fracs @ np.abs(mat - mean[None, :])
    mn = mat.min(axis=0)
    mx = mat.max(axis=0)
    mode = mat[np.argmax(fracs)]
    stats = np.stack([mean, avg_dev, mn, mx, mx - mn, mode], axis=1)  # [P, 6]

    norms = [np.sum(fracs ** p) ** (1.0 / p) for p in (2, 3, 5, 7, 10)]
    entropy = float(-(fracs * np.log(np.clip(fracs, 1e-12, 1.0))).sum())

    val_mean = float(mean[_VALENCE_COL])
    d_frac = float(mean[_D_COL]) / max(val_mean + mean[_D_COL] + mean[_F_COL],
                                       1e-9)
    f_frac = float(mean[_F_COL]) / max(val_mean + mean[_D_COL] + mean[_F_COL],
                                       1e-9)
    z_stats = [float(fracs @ zs), float(zs.max()), float(zs.min())]

    out = np.concatenate([
        stats.reshape(-1),
        [len(zs)], norms, [entropy],
        [d_frac, f_frac], z_stats,
    ])
    assert out.shape == (N_FEATURES,)
    return out.astype(np.float32)


def formula_features(formula: str) -> np.ndarray:
    """[N_FEATURES] descriptor straight from a formula string."""
    from ..data import parse_formula_composition
    return composition_features(parse_formula_composition(formula))


def featurize_formulas(formulas: Sequence[str]) -> np.ndarray:
    """[N, N_FEATURES] matrix for a list of formulas."""
    return np.stack([formula_features(f) for f in formulas])


# ---- cross-featurizer bridge -------------------------------------------------

#: numeric CSV columns that are labels/metadata, not Magpie features
#: (mirrors data/pipeline.py's magpie column auto-detection)
_NON_FEATURE_COLS = {
    'formula', 'Tc', 'composition', 'category', 'is_superconductor',
    'compound possible', 'formula_original', 'requires_high_pressure',
}


def fit_magpie_bridge(ref_csv, out_path=None, limit: int | None = None
                      ) -> Dict[str, np.ndarray]:
    """Fit a least-squares linear map from THIS module's descriptor layout
    to a reference corpus' Magpie column layout.

    The reference checkpoints were trained on matminer-Magpie features
    (145 columns in new_sc_datasets.csv); this repo's featurizer emits a
    78-dim descriptor.  Both describe the same compositions, so a linear
    bridge fit on a corpus that carries the reference columns lets a
    converted reference checkpoint be evaluated / fine-tuned on corpora
    featurized natively: ``load_dataset(..., magpie_bridge=path)`` maps
    features into the checkpoint's expected layout at load time.

    Returns {'w': [N_FEATURES+1, M] (last row = bias), 'columns': [M] str,
    'r2': [M] per-column fit quality} and saves them to ``out_path``.
    """
    import pandas as pd

    df = pd.read_csv(ref_csv)
    if limit:
        df = df.iloc[:limit]
    numeric = df.select_dtypes(include=['number']).columns
    cols = [c for c in numeric if c not in _NON_FEATURE_COLS]
    y = df[cols].values.astype(np.float64)

    feats = []
    ok = []
    for f in df['formula'].astype(str):
        try:
            feats.append(formula_features(f))
            ok.append(True)
        except Exception:
            feats.append(np.zeros(N_FEATURES))
            ok.append(False)
    x = np.asarray(feats, np.float64)
    keep = (np.asarray(ok) & np.isfinite(x).all(axis=1)
            & np.isfinite(y).all(axis=1))
    x, y = x[keep], y[keep]

    xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    w, *_ = np.linalg.lstsq(xb, y, rcond=None)
    pred = xb @ w
    ss_res = ((y - pred) ** 2).sum(axis=0)
    ss_tot = ((y - y.mean(axis=0)) ** 2).sum(axis=0) + 1e-12
    r2 = 1.0 - ss_res / ss_tot

    bridge = {'w': w.astype(np.float32),
              'columns': np.asarray(cols),
              'r2': r2.astype(np.float32)}
    if out_path is not None:
        np.savez_compressed(out_path, **bridge)
    return bridge


def load_magpie_bridge(path) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def apply_magpie_bridge(feats: np.ndarray, bridge: Dict[str, np.ndarray]
                        ) -> np.ndarray:
    """[N, N_FEATURES] native features -> [N, M] reference-layout features."""
    w = bridge['w']
    if feats.shape[1] != w.shape[0] - 1:
        raise ValueError(
            f'bridge expects {w.shape[0] - 1} input features, '
            f'got {feats.shape[1]}')
    xb = np.concatenate(
        [feats, np.ones((len(feats), 1), feats.dtype)], axis=1)
    return (xb @ w).astype(np.float32)
