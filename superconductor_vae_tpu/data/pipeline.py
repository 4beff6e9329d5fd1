"""Data pipeline: CSV -> fixed-shape numpy arrays ready for device transfer.

Capability parity with the reference's ``load_and_prepare_data``
(reference: scripts/train_v12_clean.py:1724-2287):

- tokenized formulas padded to ``max_len`` (semantic fraction tokenizer)
- element composition slots ``[N, 12]`` (indices / normalized fractions / mask)
- Tc: log1p then z-score with SC-only statistics
- Magpie: NaN fill, |skew|>threshold features rank-Gaussian transformed,
  SC-only z-score
- HP labels, contrastive category labels, rule-based 14-class family labels
- 15 compositional targets for physics-Z supervision
- generative-holdout exclusion by formula match
- content-hash ``.npz`` cache
- weighted sampling weights (SC balance x hard-length x high-Tc)

TPU-first framing: this layer produces *static-shape host arrays only*; the
training loop transfers one sharded batch per step (device_put with a
NamedSharding), so the input pipeline never appears on the device timeline.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import re
from fractions import Fraction
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..chem.elements import SYMBOL_TO_Z
from ..models.family_classifier import (
    RuleBasedFamilyClassifier, SuperconductorFamily,
)
from ..tokenizer import FractionAwareTokenizer, default_tokenizer
from .compositional_targets import normalized_compositional_targets

MAX_ELEMENTS = 12

# Contrastive category labels (reference: losses/contrastive.py:91-146)
SC_CATEGORY_LABELS = {
    'Cuprates': 0, 'Iron-based': 1, 'Bismuthates': 2, 'Borocarbides': 3,
    'Elemental Superconductors': 4, 'Hydrogen-rich Superconductors': 5,
    'Organic Superconductors': 6, 'Other': 7,
    'Non-SC: Materials Project': 8, 'Non-SC: Magnetic': 9,
    'Non-SC: Thermoelectric': 10, 'Non-SC: Anisotropy': 11,
    'High-pressure (non-hydride)': 12,
}


def category_to_label(category: str, use_extended: bool = True,
                      requires_high_pressure: int = 0) -> int:
    if not use_extended:
        return 1 if str(category).startswith('Non-SC') else 0
    category = str(category)
    if (requires_high_pressure == 1
            and category != 'Hydrogen-rich Superconductors'
            and not category.startswith('Non-SC')):
        return SC_CATEGORY_LABELS['High-pressure (non-hydride)']
    if category in SC_CATEGORY_LABELS:
        return SC_CATEGORY_LABELS[category]
    if category.startswith('Non-SC'):
        return max(SC_CATEGORY_LABELS.values())
    return SC_CATEGORY_LABELS['Other']


_COMP_SCAN = re.compile(
    r'(?:\{(?P<mass>\d+)\})?(?P<el>[A-Z][a-z]?)'
    r'(?:\((?P<num>\d+)/(?P<den>\d+)\)|(?P<dec>\d*\.\d+)|(?P<int>\d+))?'
)


def parse_formula_composition(formula: str) -> Dict[str, float]:
    """Formula string -> {element: amount}. Isotopes fold into parent element.

    Amounts repeated for the same element accumulate (crystallographic sites).
    """
    comp: Dict[str, float] = {}
    for m in _COMP_SCAN.finditer(formula):
        el = m.group('el')
        if not el or el not in SYMBOL_TO_Z:
            continue
        qty = 1.0
        if m.group('num') is not None:
            den = int(m.group('den'))
            qty = int(m.group('num')) / den if den else 1.0
        elif m.group('dec') is not None:
            # raw-source decimal notation (Ba0.2La1.8...) — the tokenizer
            # itself never sees decimals; ingestion canonicalizes to (p/q)
            qty = float(m.group('dec'))
        elif m.group('int') is not None:
            qty = float(int(m.group('int')))
        comp[el] = comp.get(el, 0.0) + qty
    return comp


@dataclasses.dataclass
class NormStats:
    tc_mean: float
    tc_std: float
    tc_log_transform: bool
    magpie_mean: np.ndarray
    magpie_std: np.ndarray
    magpie_skewed_indices: List[int]
    magpie_sc_only_norm: bool
    comp_target_stats: Optional[dict] = None
    # persisted quantile grids for the skewed columns (aligned with
    # magpie_skewed_indices; each a sorted value grid subsampled from the
    # corpus column) — makes the skew transform INVERTIBLE/applicable to
    # fresh formulas, unlike the legacy per-row-jitter rank-gauss whose
    # mapping exists only for corpus rows. None => legacy rank-gauss
    # (round-2 checkpoints); see normalize_fresh_magpie.
    magpie_quantile_grids: Optional[List[np.ndarray]] = None

    def tc_to_kelvin(self, tc_norm: np.ndarray) -> np.ndarray:
        x = tc_norm * self.tc_std + self.tc_mean
        if self.tc_log_transform:
            x = np.expm1(x)
        return np.clip(x, 0.0, None)

    def kelvin_to_norm(self, tc_k: np.ndarray) -> np.ndarray:
        x = np.log1p(tc_k) if self.tc_log_transform else np.asarray(tc_k, np.float64)
        return ((x - self.tc_mean) / self.tc_std).astype(np.float32)

    def normalize_fresh_magpie(self, raw: np.ndarray) -> Tuple[np.ndarray,
                                                               np.ndarray]:
        """Normalize a FRESH formula's raw Magpie feature vector exactly as
        the training corpus was normalized: quantile-gaussianize the skewed
        columns against the persisted grids, then z-score.

        Returns ``(normalized, valid_mask)``: under the legacy rank-gauss
        stats (no grids) the skewed columns cannot be reproduced for a
        fresh formula, so they are set to 0 (the corpus mean in z-scored
        units) and masked out.
        """
        raw = np.asarray(raw, np.float64).copy()
        if raw.shape[-1] != np.asarray(self.magpie_mean).shape[0]:
            raise ValueError(
                f'raw feature dim {raw.shape[-1]} != corpus magpie dim '
                f'{np.asarray(self.magpie_mean).shape[0]} — the fresh '
                'vector must be in the corpus column layout (use the '
                'magpie bridge for reference-layout corpora)')
        valid = np.ones(raw.shape[-1], np.float32)
        if self.magpie_quantile_grids is not None:
            for i, grid in zip(self.magpie_skewed_indices,
                               self.magpie_quantile_grids):
                raw[..., i] = quantile_gaussianize(raw[..., i],
                                                   np.asarray(grid))
        elif self.magpie_skewed_indices:
            for i in self.magpie_skewed_indices:
                raw[..., i] = np.asarray(self.magpie_mean)[i]
                valid[i] = 0.0
        out = ((raw - np.asarray(self.magpie_mean))
               / np.asarray(self.magpie_std)).astype(np.float32)
        return out, valid

    def to_json(self) -> dict:
        return {
            'tc_mean': self.tc_mean, 'tc_std': self.tc_std,
            'tc_log_transform': self.tc_log_transform,
            'magpie_mean': np.asarray(self.magpie_mean).tolist(),
            'magpie_std': np.asarray(self.magpie_std).tolist(),
            'magpie_skewed_indices': list(self.magpie_skewed_indices),
            'magpie_sc_only_norm': self.magpie_sc_only_norm,
            'comp_target_stats': self.comp_target_stats,
            'magpie_quantile_grids': (
                [np.asarray(g).tolist() for g in self.magpie_quantile_grids]
                if self.magpie_quantile_grids is not None else None),
        }


@dataclasses.dataclass
class DatasetArrays:
    """Fixed-shape host arrays for the full dataset (training rows only)."""
    formulas: List[str]
    tokens: np.ndarray            # [N, max_len] int32
    element_indices: np.ndarray   # [N, 12] int32
    element_fractions: np.ndarray  # [N, 12] float32 (normalized to sum 1)
    element_mask: np.ndarray      # [N, 12] bool
    tc: np.ndarray                # [N] float32 normalized
    magpie: np.ndarray            # [N, M] float32 normalized
    is_sc: np.ndarray             # [N] int32
    label: np.ndarray             # [N] int32 contrastive label
    hp: np.ndarray                # [N] float32
    family: np.ndarray            # [N] int32 14-class
    comp_targets: np.ndarray      # [N, 15] float32 normalized
    norm_stats: NormStats
    # original-row index per row (rows added by order augmentation share
    # their source row's index); None => no augmentation (arange identity)
    aug_group: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.tokens)

    @property
    def magpie_dim(self) -> int:
        return self.magpie.shape[1]

    def subset(self, idx: np.ndarray) -> 'DatasetArrays':
        """Row-subset view (copies): used for randomized / stratified eval
        slices (a head slice of the corpus is NOT balance-representative;
        VERDICT r3 weak #3)."""
        idx = np.asarray(idx)
        return dataclasses.replace(
            self,
            formulas=[self.formulas[i] for i in idx],
            tokens=self.tokens[idx],
            element_indices=self.element_indices[idx],
            element_fractions=self.element_fractions[idx],
            element_mask=self.element_mask[idx],
            tc=self.tc[idx],
            magpie=self.magpie[idx],
            is_sc=self.is_sc[idx],
            label=self.label[idx],
            hp=self.hp[idx],
            family=self.family[idx],
            comp_targets=self.comp_targets[idx],
            aug_group=(self.aug_group[idx]
                       if self.aug_group is not None else None),
        )

    def sample_indices(self, n: int, seed: int = 0,
                       stratify_sc: bool = False) -> np.ndarray:
        """Seeded random (optionally is_sc-stratified 50/50) row sample."""
        rng = np.random.default_rng(seed)
        n = min(n, len(self))
        if not stratify_sc:
            return np.sort(rng.choice(len(self), size=n, replace=False))
        pos = np.flatnonzero(self.is_sc == 1)
        neg = np.flatnonzero(self.is_sc != 1)
        n_pos = min(n // 2, len(pos))
        n_neg = min(n - n_pos, len(neg))
        # top up from the larger class if one side is short
        if n_pos + n_neg < n:
            n_pos = min(n - n_neg, len(pos))
        take = np.concatenate([
            rng.choice(pos, size=n_pos, replace=False),
            rng.choice(neg, size=n_neg, replace=False)])
        return np.sort(take)

    def batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            'tokens': self.tokens[idx],
            'element_indices': self.element_indices[idx],
            'element_fractions': self.element_fractions[idx],
            'element_mask': self.element_mask[idx],
            'tc': self.tc[idx],
            'magpie': self.magpie[idx],
            'is_sc': self.is_sc[idx],
            'label': self.label[idx],
            'hp': self.hp[idx],
            'family': self.family[idx],
            'comp_targets': self.comp_targets[idx],
        }


def _rank_gaussian(col: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Rank -> uniform -> inverse-normal transform for zero-inflated features.

    LEGACY (round-2 checkpoints): the per-row jitter breaks ties randomly,
    so the mapping exists only for corpus rows — a fresh formula's value
    cannot be transformed, which is why holdout reconstruction fed skewed
    columns at their mean. New corpora use the persisted quantile grids
    (``quantile_gaussianize``) instead."""
    from scipy.special import ndtri
    jittered = col + rng.normal(0, 1e-6, len(col)).astype(np.float32)
    order = np.argsort(jittered, kind='stable')
    ranks = np.empty(len(col), dtype=np.float64)
    ranks[order] = np.arange(1, len(col) + 1)
    uniform = (ranks - 0.5) / len(col)
    return ndtri(uniform).astype(np.float32)


def build_quantile_grid(col: np.ndarray, n_points: int = 1024) -> np.ndarray:
    """Sorted value grid at uniformly spaced quantiles of a corpus column —
    the persisted, fresh-formula-applicable form of the skew transform."""
    qs = np.linspace(0.0, 1.0, min(n_points, len(col)))
    return np.quantile(np.asarray(col, np.float64), qs)


def quantile_gaussianize(x: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Map values through a persisted empirical CDF to N(0,1).

    Tied blocks (zero-inflated columns are mostly one value) map to their
    mid-rank — deterministic, so corpus rows and fresh formulas transform
    identically (the invertibility the legacy jittered rank-gauss lacked).
    """
    from scipy.special import ndtri
    x = np.asarray(x, np.float64)
    n = len(grid)
    lo = np.searchsorted(grid, x, side='left')
    hi = np.searchsorted(grid, x, side='right')
    u = (lo + hi) / 2.0 / n
    u = np.clip(u, 0.5 / n, 1.0 - 0.5 / n)
    return ndtri(u).astype(np.float32)


def load_holdout_formulas(path: Optional[Path] = None) -> List[str]:
    path = Path(path or Path(__file__).resolve().parents[2]
                / 'data' / 'GENERATIVE_HOLDOUT_DO_NOT_TRAIN.json')
    if not path.exists():
        return []
    blob = json.loads(path.read_text())
    return [s['formula'] for s in blob.get('holdout_samples', [])]


def canonical_composition_key(formula: str) -> Optional[Tuple]:
    """Spelling-independent composition identity: normalized element
    fractions rounded to 1e-6.  Used for holdout exclusion — exact-string
    matching (the reference's approach, sufficient for its pre-cleaned
    1,810-row corpus) silently misses respellings once ingestion
    canonicalizes subscripts to (p/q) notation: 42/45 holdout targets
    re-entered the 28K corpus under different spellings."""
    try:
        comp = parse_formula_composition(formula)
    except Exception:
        return None
    if not comp:
        return None
    tot = sum(comp.values())
    if tot <= 0:
        return None
    return tuple(sorted((el, round(amt / tot, 6)) for el, amt in comp.items()))


def load_dataset(
    csv_path: str | Path,
    max_len: int = 30,
    tokenizer: Optional[FractionAwareTokenizer] = None,
    skew_threshold: float = 3.0,
    sc_only_norm: bool = True,
    tc_log_transform: bool = True,
    exclude_holdout: bool = True,
    cache_dir: Optional[str | Path] = 'outputs/data_cache',
    limit: Optional[int] = None,
    drop_unk: bool = True,
    magpie_bridge: Optional[str | Path] = None,
    skew_transform: str = 'quantile',
    order_augment: int = 0,
    order_augment_seed: int = 0,
) -> DatasetArrays:
    """CSV -> DatasetArrays, with a content-hash npz cache.

    ``drop_unk`` removes rows whose tokenization contains UNK / FRAC_UNK —
    such targets are unreachable for the decoder and teach it to emit UNK
    (the reference builds its corpus UNK-free by construction).

    ``magpie_bridge`` maps the CSV's native Magpie features into a
    reference checkpoint's expected layout before normalization
    (chem/featurize.fit_magpie_bridge) so converted reference checkpoints
    can be evaluated / fine-tuned on natively-featurized corpora.

    ``skew_transform``: 'quantile' (default) gaussianizes |skew|>threshold
    columns through persisted quantile grids — deterministic and
    applicable to FRESH formulas (holdout reconstruction, guided search);
    'rank_gauss' is the legacy jittered transform round-2 checkpoints
    were trained on (corpus-rows-only mapping).

    ``order_augment``: K > 0 appends up to K random element-order
    respellings per multi-element row (reference:
    data/canonical_ordering.py:228-295 OrderAugmentation) as REAL extra
    rows — tokens and element slots follow the new appearance order;
    Tc/Magpie/labels (order-free) are shared.  ``DatasetArrays.aug_group``
    maps every row to its original-row index and ``compute_sample_weights``
    splits each original row's weight across its spellings, so an epoch
    sees the same composition distribution as K=0."""
    import pandas as pd

    csv_path = Path(csv_path)
    tokenizer = tokenizer or default_tokenizer(max_len=max_len)

    cache_file = None
    if cache_dir is not None:
        h = hashlib.sha256()
        h.update(csv_path.read_bytes())
        h.update(f'{max_len}|{skew_threshold}|{sc_only_norm}|'
                 f'{tc_log_transform}|{exclude_holdout}.v2|{limit}|'
                 f'{tokenizer.vocab_size}|{drop_unk}|'
                 f'{magpie_bridge}|{skew_transform}|'
                 f'{order_augment}.{order_augment_seed}'.encode())
        cache_file = Path(cache_dir) / f'dataset_{h.hexdigest()[:16]}.npz'
        if cache_file.exists():
            return _load_cache(cache_file)

    df = pd.read_csv(csv_path)
    # NOTE: ``limit`` is applied AFTER normalization (below) so limited
    # loads (smoke tests, scripts/evaluate.py --limit) see the same
    # full-corpus Tc/Magpie statistics as training — subset-derived stats
    # shift every encoder input and silently wreck eval numbers

    formulas = df['formula'].astype(str).tolist()
    tc_raw = df['Tc'].fillna(0.0).values.astype(np.float64)
    is_sc = (df['is_superconductor'].values.astype(np.int32)
             if 'is_superconductor' in df else np.ones(len(df), np.int32))
    hp = (df['requires_high_pressure'].values.astype(np.float32)
          if 'requires_high_pressure' in df else np.zeros(len(df), np.float32))
    if 'category' in df:
        label = np.array([
            category_to_label(c, requires_high_pressure=int(h))
            for c, h in zip(df['category'].values, hp)], dtype=np.int32)
    else:
        label = np.zeros(len(df), np.int32)

    # Tc normalization: log1p + SC-only z-score
    sc_mask = is_sc == 1
    tc_t = np.log1p(tc_raw) if tc_log_transform else tc_raw
    ref = tc_t[sc_mask] if sc_mask.any() else tc_t
    tc_mean, tc_std = float(ref.mean()), float(ref.std() + 1e-8)
    tc = ((tc_t - tc_mean) / tc_std).astype(np.float32)

    # Magpie features: all numeric cols minus known non-features
    exclude = {'formula', 'Tc', 'composition', 'category', 'is_superconductor',
               'compound possible', 'formula_original', 'requires_high_pressure'}
    numeric = df.select_dtypes(include=['number']).columns
    magpie_cols = [c for c in numeric if c not in exclude]
    magpie = df[magpie_cols].values.astype(np.float32)
    nan_mask = np.isnan(magpie)
    if nan_mask.any():
        with np.errstate(invalid='ignore'):
            col_means = np.nan_to_num(np.nanmean(magpie, axis=0))
        magpie = np.where(nan_mask, col_means[None, :], magpie)

    if magpie_bridge is not None:
        from ..chem.featurize import apply_magpie_bridge, load_magpie_bridge
        magpie = apply_magpie_bridge(magpie, load_magpie_bridge(magpie_bridge))

    skewed_idx: List[int] = []
    quantile_grids: Optional[List[np.ndarray]] = None
    if skew_threshold > 0:
        from scipy.stats import skew
        rng = np.random.default_rng(42)
        sk = skew(magpie, axis=0)
        skewed_idx = np.where(np.abs(np.nan_to_num(sk)) > skew_threshold)[0].tolist()
        if skew_transform == 'quantile':
            quantile_grids = []
            for i in skewed_idx:
                grid = build_quantile_grid(magpie[:, i])
                quantile_grids.append(grid)
                magpie[:, i] = quantile_gaussianize(magpie[:, i], grid)
        else:
            for i in skewed_idx:
                magpie[:, i] = _rank_gaussian(magpie[:, i], rng)

    stats_rows = sc_mask if (sc_only_norm and sc_mask.any()) else np.ones(len(df), bool)
    mg_mean = magpie[stats_rows].mean(axis=0)
    mg_std = magpie[stats_rows].std(axis=0) + 1e-8
    magpie = (magpie - mg_mean) / mg_std

    if limit:
        formulas = formulas[:limit]
        tc, tc_raw, is_sc = tc[:limit], tc_raw[:limit], is_sc[:limit]
        hp, label, magpie = hp[:limit], label[:limit], magpie[:limit]

    # Tokenize + parse compositions — native C++ fast path with Python
    # fallback (superconductor_vae_tpu/native)
    from .. import native as _native
    n = len(formulas)
    tokens = _native.tokenize_batch(formulas, tokenizer)
    if tokens is None:
        tokens = tokenizer.encode_batch(formulas)
    parsed = _native.parse_compositions(formulas, tokenizer, MAX_ELEMENTS)
    if parsed is not None:
        elem_idx, elem_frac, elem_mask = parsed
        elem_idx = elem_idx.astype(np.int32)
    else:
        elem_idx = np.zeros((n, MAX_ELEMENTS), np.int32)
        elem_frac = np.zeros((n, MAX_ELEMENTS), np.float32)
        elem_mask = np.zeros((n, MAX_ELEMENTS), bool)
        for i, f in enumerate(formulas):
            comp = parse_formula_composition(f)
            total = sum(comp.values()) or 1.0
            for j, (el, amt) in enumerate(comp.items()):
                if j >= MAX_ELEMENTS:
                    break
                elem_idx[i, j] = SYMBOL_TO_Z[el]
                elem_frac[i, j] = amt / total
                elem_mask[i, j] = True
    from ..models.family_classifier import classify_batch
    family = np.where(
        is_sc == 1,
        classify_batch(elem_idx, np.asarray(elem_mask)),
        int(SuperconductorFamily.NOT_SUPERCONDUCTOR)).astype(np.int32)

    comp_targets, comp_stats = normalized_compositional_targets(
        elem_idx, elem_frac, elem_mask)

    # Holdout exclusion at COMPOSITION level (stronger than the
    # reference's formula-string match): any row whose normalized element
    # fractions equal a holdout target's is excluded, regardless of
    # spelling (see canonical_composition_key)
    keep = np.ones(n, bool)
    if exclude_holdout:
        holdout = set(load_holdout_formulas())
        if holdout:
            hold_keys = {canonical_composition_key(f) for f in holdout}
            hold_keys.discard(None)
            keep = np.array([
                f not in holdout
                and canonical_composition_key(f) not in hold_keys
                for f in formulas])
    if drop_unk:
        from ..tokenizer import FRAC_UNK_ID, UNK_ID
        has_unk = ((tokens == UNK_ID) | (tokens == FRAC_UNK_ID)).any(axis=1)
        keep &= ~has_unk

    norm_stats = NormStats(
        tc_mean=tc_mean, tc_std=tc_std, tc_log_transform=tc_log_transform,
        magpie_mean=mg_mean, magpie_std=mg_std,
        magpie_skewed_indices=skewed_idx, magpie_sc_only_norm=sc_only_norm,
        comp_target_stats=comp_stats,
        magpie_quantile_grids=quantile_grids,
    )
    ds = DatasetArrays(
        formulas=[f for f, k in zip(formulas, keep) if k],
        tokens=tokens[keep].astype(np.int32),
        element_indices=elem_idx[keep],
        element_fractions=elem_frac[keep],
        element_mask=elem_mask[keep],
        tc=tc[keep], magpie=magpie[keep].astype(np.float32),
        is_sc=is_sc[keep], label=label[keep], hp=hp[keep],
        family=family[keep], comp_targets=comp_targets[keep],
        norm_stats=norm_stats,
    )
    if order_augment > 0:
        ds = _apply_order_augmentation(ds, tokenizer, order_augment,
                                       order_augment_seed)
    if cache_file is not None:
        _save_cache(cache_file, ds)
    return ds


def _build_aug_rows(spellings: List[str],
                    tokenizer: FractionAwareTokenizer):
    """Tokenize respellings and build their appearance-order element slots.
    Returns (tokens [n, max_len], idx, frac, mask [n, 12], ok [n]) where
    ``ok`` marks respellings that round-tripped through the tokenizer."""
    from ..tokenizer import FRAC_UNK_ID, UNK_ID
    from .. import native as _native

    toks = _native.tokenize_batch(spellings, tokenizer)
    if toks is None:
        toks = tokenizer.encode_batch(spellings)
    toks = toks.astype(np.int32)
    n = len(spellings)
    a_idx = np.zeros((n, MAX_ELEMENTS), np.int32)
    a_frac = np.zeros((n, MAX_ELEMENTS), np.float32)
    a_mask = np.zeros((n, MAX_ELEMENTS), bool)
    ok = np.ones(n, bool)
    for j, f in enumerate(spellings):
        comp_items = []  # appearance order
        seen: Dict[str, int] = {}
        for m in _COMP_SCAN.finditer(f):
            el = m.group('el')
            if not el or el not in SYMBOL_TO_Z:
                continue
            qty = 1.0
            if m.group('num') is not None:
                den = int(m.group('den'))
                qty = int(m.group('num')) / den if den else 1.0
            elif m.group('dec') is not None:
                qty = float(m.group('dec'))
            elif m.group('int') is not None:
                qty = float(int(m.group('int')))
            if el in seen:
                comp_items[seen[el]][1] += qty
            else:
                seen[el] = len(comp_items)
                comp_items.append([el, qty])
        total = sum(q for _, q in comp_items) or 1.0
        if not comp_items or len(comp_items) > MAX_ELEMENTS:
            ok[j] = False
            continue
        for s, (el, qty) in enumerate(comp_items):
            a_idx[j, s] = SYMBOL_TO_Z[el]
            a_frac[j, s] = qty / total
            a_mask[j, s] = True
        # a respelling is exactly the original's tokens reordered, so it
        # fits max_len iff the original did; UNK can only appear if the
        # respelling failed to round-trip through the tokenizer
        row = toks[j]
        if ((row == UNK_ID) | (row == FRAC_UNK_ID)).any():
            ok[j] = False
    return toks, a_idx, a_frac, a_mask, ok


def resample_order_augmentation(ds: DatasetArrays,
                                tokenizer: FractionAwareTokenizer,
                                seed: int) -> DatasetArrays:
    """Redraw the element-order respellings of every augmented row IN PLACE
    (same row count / same source mapping, fresh random permutations).

    Round-4 finding (results/run5/order_robust.json): static K=1
    augmentation teaches the decoder the one extra spelling it saw, not the
    rule "emit elements in conditioning order" — novel permutations decoded
    at 21.7% vs 78.4% on seen spellings.  Per-epoch resampling turns the
    ordering supervision into fresh draws each epoch, which is the standard
    augmentation regime the reference's OrderAugmentation was built for
    (reference: data/canonical_ordering.py:228-295, 'randomize per epoch').

    Rows whose fresh respelling fails to round-trip keep their previous
    spelling (static shapes: the device-resident epoch scan needs a fixed
    row count).  Source rows are untouched."""
    if ds.aug_group is None:
        return ds
    aug_rows = np.where(ds.aug_group != np.arange(len(ds)))[0]
    if len(aug_rows) == 0:
        return ds
    from .canonical_ordering import parse_ordered, join_ordered

    rng = np.random.default_rng(seed)
    spellings = []
    for r in aug_rows:
        src_f = ds.formulas[ds.aug_group[r]]
        parts = parse_ordered(src_f)
        if len(parts) > 1:
            order = rng.permutation(len(parts))
            spellings.append(join_ordered([parts[i] for i in order]))
        else:
            spellings.append(src_f)
    toks, a_idx, a_frac, a_mask, ok = _build_aug_rows(spellings, tokenizer)

    formulas = list(ds.formulas)
    tokens = ds.tokens.copy()
    e_idx = ds.element_indices.copy()
    e_frac = ds.element_fractions.copy()
    e_mask = ds.element_mask.copy()
    upd = aug_rows[ok]
    formulas_arr = np.array(formulas, dtype=object)
    formulas_arr[upd] = np.array(spellings, dtype=object)[ok]
    tokens[upd] = toks[ok]
    e_idx[upd] = a_idx[ok]
    e_frac[upd] = a_frac[ok]
    e_mask[upd] = a_mask[ok]
    return dataclasses.replace(
        ds, formulas=list(formulas_arr), tokens=tokens,
        element_indices=e_idx, element_fractions=e_frac, element_mask=e_mask)


def _apply_order_augmentation(ds: DatasetArrays,
                              tokenizer: FractionAwareTokenizer,
                              k: int, seed: int) -> DatasetArrays:
    """Append up to ``k`` random element-order respellings per multi-element
    row as real dataset rows (reference: data/canonical_ordering.py:228-295).

    Tokens and element slots follow each new spelling's appearance order —
    the encoder's element-slot inputs, the fraction head's per-slot targets
    and the decoder's target sequence all stay mutually consistent per row.
    Order-free tensors (Tc, Magpie, labels, comp targets) are shared with
    the source row.  A respelling whose tokenization does not round-trip to
    the same composition (overlong / out-of-vocab) is skipped."""
    from .canonical_ordering import OrderAugmentation

    aug = OrderAugmentation(n_augmentations=k, seed=seed)
    src_rows: List[int] = []
    spellings: List[str] = []
    for i, f in enumerate(ds.formulas):
        for g in aug.augment(f, include_original=False):
            src_rows.append(i)
            spellings.append(g)
    if not spellings:
        return ds

    toks, a_idx, a_frac, a_mask, ok = _build_aug_rows(spellings, tokenizer)
    src = np.asarray(src_rows)[ok]
    order = np.arange(len(ds))
    return DatasetArrays(
        formulas=ds.formulas + [s for s, o in zip(spellings, ok) if o],
        tokens=np.concatenate([ds.tokens, toks[ok]]),
        element_indices=np.concatenate([ds.element_indices, a_idx[ok]]),
        element_fractions=np.concatenate([ds.element_fractions, a_frac[ok]]),
        element_mask=np.concatenate([ds.element_mask, a_mask[ok]]),
        tc=np.concatenate([ds.tc, ds.tc[src]]),
        magpie=np.concatenate([ds.magpie, ds.magpie[src]]),
        is_sc=np.concatenate([ds.is_sc, ds.is_sc[src]]),
        label=np.concatenate([ds.label, ds.label[src]]),
        hp=np.concatenate([ds.hp, ds.hp[src]]),
        family=np.concatenate([ds.family, ds.family[src]]),
        comp_targets=np.concatenate([ds.comp_targets, ds.comp_targets[src]]),
        norm_stats=ds.norm_stats,
        aug_group=np.concatenate([order, src]).astype(np.int32),
    )


def _save_cache(path: Path, ds: DatasetArrays) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        formulas=np.array(ds.formulas, dtype=object),
        tokens=ds.tokens, element_indices=ds.element_indices,
        element_fractions=ds.element_fractions, element_mask=ds.element_mask,
        tc=ds.tc, magpie=ds.magpie, is_sc=ds.is_sc, label=ds.label,
        hp=ds.hp, family=ds.family, comp_targets=ds.comp_targets,
        norm_stats=np.array(json.dumps(ds.norm_stats.to_json()), dtype=object),
        aug_group=(ds.aug_group if ds.aug_group is not None
                   else np.array([], np.int32)),
        allow_pickle=True,
    )


def _load_cache(path: Path) -> DatasetArrays:
    blob = np.load(path, allow_pickle=True)
    st = json.loads(str(blob['norm_stats']))
    grids = st.get('magpie_quantile_grids')
    norm_stats = NormStats(
        tc_mean=st['tc_mean'], tc_std=st['tc_std'],
        tc_log_transform=st['tc_log_transform'],
        magpie_mean=np.array(st['magpie_mean'], np.float32),
        magpie_std=np.array(st['magpie_std'], np.float32),
        magpie_skewed_indices=st['magpie_skewed_indices'],
        magpie_sc_only_norm=st['magpie_sc_only_norm'],
        comp_target_stats=st.get('comp_target_stats'),
        magpie_quantile_grids=([np.asarray(g) for g in grids]
                               if grids is not None else None),
    )
    aug_group = blob['aug_group'] if 'aug_group' in blob else None
    if aug_group is not None and aug_group.size == 0:
        aug_group = None
    return DatasetArrays(
        formulas=list(blob['formulas']),
        tokens=blob['tokens'], element_indices=blob['element_indices'],
        element_fractions=blob['element_fractions'],
        element_mask=blob['element_mask'], tc=blob['tc'],
        magpie=blob['magpie'], is_sc=blob['is_sc'], label=blob['label'],
        hp=blob['hp'], family=blob['family'], comp_targets=blob['comp_targets'],
        norm_stats=norm_stats, aug_group=aug_group,
    )


def compute_sample_weights(
    ds: DatasetArrays,
    balanced: bool = True,
    oversample_hard: bool = True,
    oversample_length_base: float = 15.0,
    oversample_high_tc: bool = True,
    tc_bins: Optional[Dict[float, float]] = None,
) -> np.ndarray:
    """Weighted-sampling weights: SC balance x hard-length x high-Tc boosts
    (reference: train_v12_clean.py:2179-2258)."""
    n = len(ds)
    w = np.ones(n, np.float64)
    if balanced:
        n_sc = int((ds.is_sc == 1).sum())
        n_non = n - n_sc
        # only balance when the minority class is substantial — with a
        # handful of minority rows, 50/50 balancing would replay the same
        # few samples hundreds of times per epoch
        minority = min(n_sc, n_non)
        if minority >= max(20, int(0.01 * n)):
            w = np.where(ds.is_sc == 1, 1.0 / n_sc, 1.0 / n_non)
    if oversample_hard:
        seq_len = (ds.tokens != 0).sum(axis=1).astype(np.float64)
        n_elem = ds.element_mask.sum(axis=1).astype(np.float64)
        length_boost = 1.0 + np.clip(
            (seq_len - oversample_length_base) / oversample_length_base, 0, 3.0)
        elem_boost = 1.0 + 0.5 * np.clip(n_elem - 3, 0, 4.0)
        w = w * length_boost * elem_boost
    if oversample_high_tc:
        bins = tc_bins or {50.0: 3.0, 100.0: 10.0}
        tc_k = ds.norm_stats.tc_to_kelvin(ds.tc)
        boost = np.ones(n)
        for thr in sorted(bins):
            mask = (tc_k >= thr) & (ds.is_sc == 1)
            boost[mask] = bins[thr]
        w = w * boost
    if ds.aug_group is not None:
        # order augmentation: split each original row's probability mass
        # across its spellings so the per-composition distribution an epoch
        # sees is unchanged by K
        counts = np.bincount(ds.aug_group, minlength=ds.aug_group.max() + 1)
        w = w / counts[ds.aug_group]
    return (w / w.sum()).astype(np.float64)
