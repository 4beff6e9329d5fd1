"""Source-specific dataset readers for corpus construction.

Host-side (pandas/numpy) equivalents of the reference's per-source
ingestion suite — NEMAD (reference: scripts/ingest_nemad.py), the
multi-source merger over MDR SuperCon / SuperCon2 / 3DSC / SODNet /
manual hydrides (reference: scripts/ingest_new_datasets.py) — exposed as
composable readers that all emit one normalized frame schema:

    formula (raw cleaned string), Tc (K), is_superconductor,
    tc_source ('experimental'|'calculated'), dataset, category_hint

``scripts/ingest.py`` drives these (``--nemad``, ``--mdr``, …), converts
formulas to the tokenizer's (p/q) notation, assigns categories, labels
high pressure and merges with holdout exclusion.  Everything here is
pure host code — no JAX — and no network access: readers take local
files only.
"""

from __future__ import annotations

import re
import unicodedata
from fractions import Fraction
from pathlib import Path
from typing import Dict, Iterable, Optional, Set

__all__ = [
    'parse_tc_text', 'clean_formula_text', 'is_retracted_or_contaminated',
    'read_nemad', 'read_mdr', 'read_supercon2', 'read_threedsc',
    'read_sodnet', 'manual_hydrides', 'merge_sources',
    'canonical_key',
]

# ---------------------------------------------------------------------------
# Tc free-text parsing (NEMAD's Superconducting_Transition_Temperature field)
# ---------------------------------------------------------------------------

# qualitative / conditional descriptions that carry no single reliable value
_TC_SKIP_SUBSTRINGS = (
    'onset', 'midpoint', 'zero resistance', 'annealed', 'as-prepared',
    'as-synthesized', 'cooling', 'kbar', 'gpa', 'pressure', 'calculated',
    'resistivity', 'suscept', 'specific heat', 'irrad', 'sample #',
    'figure', 'crystal', 'thickness', 'film', 'tc1', 'tc2', 'tc,', 'tc(',
    'tc^', 'tc+', 'tc-', 'tconset', 'tczero', 'o16', 'o18',
)
_TC_SKIP_PREFIXES = (
    'nsc', 'no supercond', 'not supercond', 'not observed', 'no transition',
    'variable', 'varies', 'suppressed', 'depress', 'decreas', 'enhanc',
    'above', 'below', 'between', 'broad', 'anomal', 'near', 'trace',
    'room temp', 'behaves', 'shows', 'detected', 'increas', 'rises',
    'peak', 'plateau', 'maximum', 'minimum', 'filamentary', 'abrupt',
    'rapidly', 'strongly', 'lower', 'local', 'pressure-induced',
    'proximity-induced', 'pair-breaking', 'sc under', 'superconducting above',
)
_NUM = r'(\d+(?:\.\d+)?)'


def parse_tc_text(text) -> Optional[float]:
    """Free-text Tc -> Kelvin float, or None when no single reliable value.

    Handles the notation zoo of literature-scraped fields: ``"93 K"``,
    ``"~39K"``, ``"4.2"``, ranges (midpoint), ``"92 ± 1 K"`` (center).
    Qualitative, conditional (pressure/annealing/onset-vs-zero),
    multi-valued, sub-Kelvin-unit and inequality entries return None —
    a wrong Tc is worse than a dropped row
    (reference behavior: scripts/ingest_nemad.py:93-196).
    """
    if not isinstance(text, str):
        return None
    s = text.strip()
    low = s.lower()
    if not s or low in ('nsc', 'n/a', 'na', '-', 'n.s.', 'n.s', 'none'):
        return None
    if any(low.startswith(p) for p in _TC_SKIP_PREFIXES):
        return None
    if any(k in low for k in _TC_SKIP_SUBSTRINGS):
        return None
    if re.search(r'\d\s*(mk|mev|µev|uev)\b', low):
        return None
    # multi-valued entries: "90 K, 60 K" / "90; 60" / "90/110 K"
    if ';' in s or (',' in s and 'k' in low) or ('/' in s and 'k' in low):
        return None
    # inequalities are bounds, not values
    if re.match(r'^\s*[≃≲≳≤≥<>]', s):
        return None
    s = s.replace('∼', '~').replace('≈', '~').replace('–', '-') \
         .replace('—', '-')
    m = re.match(rf'^~?{_NUM}\s*(?:±\s*{_NUM})?\s*K?$', s)
    if m:
        return float(m.group(1))
    m = re.match(rf'^~?{_NUM}\s*-\s*{_NUM}\s*K?$', s)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return (lo + hi) / 2.0 if lo <= hi else None
    return None


# ---------------------------------------------------------------------------
# Formula cleaning (literature notation -> parseable composition string)
# ---------------------------------------------------------------------------

_SUBSUP = str.maketrans('₀₁₂₃₄₅₆₇₈₉⁰¹²³⁴⁵⁶⁷⁸⁹', '01234567890123456789')


def clean_formula_text(raw) -> Optional[str]:
    """Literature formula string -> cleaned ASCII formula, or None.

    Normalizes unicode sub/superscripts, strips variable-stoichiometry
    notation (±δ, +x, O7-y), dopant suffixes ("+ 2 wt% Ag"), picks the
    base phase of additive/base slash composites, and rejects strings
    with no recoverable stoichiometry (pure dash alloys "Nb-Ti",
    percentage mixtures) — reference: scripts/ingest_nemad.py:264-346.
    """
    if not isinstance(raw, str) or not raw.strip():
        return None
    s = unicodedata.normalize('NFKC', raw.strip()).translate(_SUBSUP)
    s = s.replace('·', '').replace('•', '')
    s = s.replace('–', '-').replace('—', '-')
    s = s.replace('​', '').replace(' ', ' ')
    # variable stoichiometry: ±δ / +δ / -δ / +x / -y / ±0.1
    s = re.sub(r'[±+\-]?\s*[δΔ]', '', s)
    s = re.sub(r'[+\-]\s*[xyzn]\b', '', s)
    s = re.sub(r'±\s*\d*\.?\d*', '', s)
    # dopant additions: "+ 2 wt% Ag", "with 5% excess O"
    s = re.sub(r'\+\s*[\d.]+\s*(wt|at|mol|vol)\s*%.*$', '', s, flags=re.I)
    s = re.sub(r'\bwith\s+[\d.]+\s*%.*$', '', s, flags=re.I)
    # additive/base composites: "(Ag)0.5/YBa2Cu3O7" -> base phase.
    # A slash inside parentheses is (p/q) fraction notation — the
    # tokenizer's own stoichiometry format — NOT a composite separator.
    composite_slash = re.search(r'/(?![^()]*\))', s) if '/' in s else None
    if composite_slash:
        left, right = s[:composite_slash.start()], s[composite_slash.end():]
        if re.match(r'^\([A-Za-z0-9]+\)\s*[\d.]+$', left.strip()):
            s = right.strip()
        else:
            s = left.strip()
    if re.search(r'\d+\s*%', s):
        return None
    # dash alloys with no stoichiometry: "Nb-Ti", "La-Ba-Cu-O"
    if re.match(r'^([A-Z][a-z]?\s*-\s*)+[A-Z][a-z]?$', s):
        return None
    s = re.sub(r'[{}]', '', s)
    # trailing prose comments "(single phase)"
    s = re.sub(r'\s*\([a-z ]+\)\s*$', '', s, flags=re.I)
    s = s.strip()
    if len(s) < 2 or not re.search(r'[A-Z]', s):
        return None
    return s


# ---------------------------------------------------------------------------
# Retraction / contamination filters
# ---------------------------------------------------------------------------

def is_retracted_or_contaminated(formula: str, tc: float,
                                 elements: Optional[Set[str]] = None,
                                 n_elements: Optional[int] = None) -> bool:
    """True for rows that are known-retracted claims or likely non-SC
    transitions mislabeled as Tc (reference:
    scripts/ingest_new_datasets.py read_mdr/read_supercon2 filters):

    - Lu-H near-room-temperature (250-300K) and C-S-H (280-295K)
      retracted claims; Pb-C-O >300K unconfirmed,
    - manganite Curie temperatures ((La|Ca|Sr)-Mn-O with "Tc">50K),
    - dilute-magnetic ZnO "Tc">50K,
    - any non-hydride >200K (structural/magnetic transitions).
    """
    if elements is None:
        elements = set(re.findall(r'[A-Z][a-z]?', formula))
    if n_elements is None:
        n_elements = len(elements)
    has_h = 'H' in elements
    if has_h and 'Lu' in elements and 250 <= tc <= 300:
        return True
    if {'C', 'S', 'H'} <= elements and n_elements <= 4 and 280 <= tc <= 295:
        return True
    if {'Pb', 'C', 'O'} <= elements and tc > 300:
        return True
    if 'Mn' in elements and 'O' in elements and tc > 50 and \
            elements & {'La', 'Ca', 'Sr'}:
        return True
    if {'Zn', 'O'} <= elements and n_elements <= 3 and tc > 50:
        return True
    if tc > 200 and not has_h:
        return True
    return False


# ---------------------------------------------------------------------------
# Per-source readers -> normalized frame
# ---------------------------------------------------------------------------

_SCHEMA = ['formula', 'Tc', 'is_superconductor', 'tc_source', 'dataset',
           'category_hint']


def _finish(df, dataset: str, tc_source: str = 'experimental',
            tc_max: float = 400.0, drop_retracted: bool = True):
    """Common tail: Tc range filter, retraction filter, schema projection."""
    import numpy as np
    import pandas as pd
    df = df[df['formula'].notna()].copy()
    df['Tc'] = pd.to_numeric(df['Tc'], errors='coerce')
    df = df[df['Tc'].notna() & np.isfinite(df['Tc'])
            & (df['Tc'] >= 0) & (df['Tc'] <= tc_max)]
    if drop_retracted:
        df = df[~df.apply(
            lambda r: is_retracted_or_contaminated(r['formula'], r['Tc']),
            axis=1)]
    df['is_superconductor'] = (df['Tc'] > 0).astype(int)
    df['tc_source'] = tc_source
    df['dataset'] = dataset
    if 'category_hint' not in df:
        df['category_hint'] = ''
    return df[_SCHEMA].reset_index(drop=True)


def read_nemad(path_or_df, experimental_only: bool = True):
    """NEMAD export: Chemical_Composition + Median_Tc_By_Composition_K
    (primary) with free-text Tc fallback; experimental-rows filter.
    Reference: scripts/ingest_nemad.py:77-260."""
    import pandas as pd
    df = (path_or_df if isinstance(path_or_df, pd.DataFrame)
          else pd.read_csv(path_or_df, on_bad_lines='skip'))
    if experimental_only and 'Data_Type' in df:
        df = df[df['Data_Type'].astype(str).str.lower()
                .str.contains('experiment', na=False)]

    def _tc(row):
        med = row.get('Median_Tc_By_Composition_K')
        try:
            v = float(med)
            if v >= 0 and v == v:  # finite, non-NaN
                return v
        except (TypeError, ValueError):
            pass
        return parse_tc_text(row.get('Superconducting_Transition_Temperature'))

    out = pd.DataFrame({
        'formula': df.get('Chemical_Composition', df.get('formula'))
                     .map(clean_formula_text),
        'Tc': df.apply(_tc, axis=1),
    })
    return _finish(out, 'nemad')


def read_mdr(path):
    """MDR SuperCon (NIMS) primary.tsv: 3 header rows; positional columns
    (2=formula, 5=Tc); variable-oxygen suffix strip.
    Reference: scripts/ingest_new_datasets.py:97-175."""
    import pandas as pd

    def _clean(raw):
        if not isinstance(raw, str) or not raw.strip():
            return None
        s = re.sub(r'[-+][YZXdyzx]$', '', raw.strip())
        s = re.sub(r'O[zZxXyYdD]$', 'O', s)
        return s or None

    df = pd.read_csv(path, sep='\t', skiprows=3, header=None,
                     on_bad_lines='skip', dtype=str)
    out = pd.DataFrame({'formula': df[2].map(_clean), 'Tc': df[5]})
    return _finish(out, 'mdr_supercon')


def read_supercon2(path):
    """SuperCon2 (literature-mined) cleanup CSV: formula +
    criticalTemperature, contamination filters via ``_finish``.
    Reference: scripts/ingest_new_datasets.py:178-249."""
    import pandas as pd
    df = pd.read_csv(path, on_bad_lines='skip')
    out = pd.DataFrame({
        'formula': df['formula'].map(clean_formula_text),
        'Tc': df.get('criticalTemperature', df.get('Tc')),
        'category_hint': df.get('materialClass', '').fillna('')
        if 'materialClass' in df else '',
    })
    return _finish(out, 'supercon2')


def read_threedsc(path):
    """3DSC_MP.csv (comment header line): formula_sc + tc + sc_class hint.
    Reference: scripts/ingest_new_datasets.py:252-283."""
    import pandas as pd
    df = pd.read_csv(path, comment='#', on_bad_lines='skip')
    out = pd.DataFrame({
        'formula': df['formula_sc'],
        'Tc': df['tc'],
        'category_hint': df.get('sc_class', '').fillna('')
        if 'sc_class' in df else '',
    })
    return _finish(out, '3dsc', drop_retracted=False)


def read_sodnet(path):
    """SODNet SuperCon CSV: Formula + Tc + Materials_family hint.
    Reference: scripts/ingest_new_datasets.py:285-313."""
    import pandas as pd
    df = pd.read_csv(path, on_bad_lines='skip')
    out = pd.DataFrame({
        'formula': df['Formula'],
        'Tc': df['Tc'],
        'category_hint': df.get('Materials_family', '').fillna('')
        if 'Materials_family' in df else '',
    })
    return _finish(out, 'sodnet', drop_retracted=False)


# 12 DAC-synthesized hydrides from the experimental literature — the high-Tc
# tail the scraped databases under-represent (reference:
# scripts/ingest_new_datasets.py:315-358; docs/high_tc_data_acquisition.md).
_MANUAL_HYDRIDES = (
    ('H3S', 203.0, 155), ('LaH10', 250.0, 170), ('LaH10', 260.0, 190),
    ('YH9', 243.0, 201), ('YH6', 224.0, 166), ('CaH6', 215.0, 172),
    ('La0.5Y0.5H10', 253.0, 183), ('La0.5Ce0.5H9', 178.0, 97),
    ('ThH10', 161.0, 175), ('ThH9', 146.0, 170), ('CeH9', 117.0, 95),
    ('LaBeH8', 110.0, 80),
)


def manual_hydrides():
    """The curated experimental hydride entries (all high-pressure SC)."""
    import pandas as pd
    df = pd.DataFrame(_MANUAL_HYDRIDES,
                      columns=['formula', 'Tc', 'pressure_gpa'])
    df['is_superconductor'] = 1
    df['tc_source'] = 'experimental'
    df['dataset'] = 'manual_hydrides'
    df['category_hint'] = 'hydride'
    return df[_SCHEMA + ['pressure_gpa']]


# ---------------------------------------------------------------------------
# Merge with dedup / conflict resolution / holdout exclusion
# ---------------------------------------------------------------------------

def canonical_key(formula: str) -> Optional[str]:
    """Order/scale-invariant composition key for cross-source dedup:
    elements sorted, fractions normalized to sum 1 and rationalized.
    The same physical composition spelled differently by two databases
    ("YBa2Cu3O7" vs "Ba2Cu3O7Y1") maps to one key."""
    from .pipeline import parse_formula_composition
    comp = parse_formula_composition(formula)
    if not comp:
        return None
    total = sum(comp.values())
    if total <= 0:
        return None
    parts = []
    for el in sorted(comp):
        frac = Fraction(comp[el] / total).limit_denominator(10000)
        parts.append(f'{el}:{frac.numerator}/{frac.denominator}')
    return '|'.join(parts)


_SOURCE_PRIORITY = {  # higher wins a Tc conflict for the same composition
    'manual_hydrides': 5, 'mdr_supercon': 4, 'nemad': 3, '3dsc': 2,
    'sodnet': 2, 'supercon2': 1,
}


def merge_sources(frames: Iterable, holdout_keys: Set[str] = frozenset(),
                  existing_keys: Set[str] = frozenset(),
                  tc_tol_frac: float = 0.2):
    """Concatenate normalized frames, resolve per-composition conflicts and
    drop holdout/already-ingested compositions.

    Same composition across sources: if the Tc spread is within
    ``tc_tol_frac`` of the median, keep the median-Tc row (robust vs a
    straight priority pick); otherwise keep the highest-priority source's
    row (curated > NIMS > scraped — reference:
    scripts/ingest_new_datasets.py merge step).  Returns
    (merged_frame, report_dict).
    """
    import numpy as np
    import pandas as pd
    df = pd.concat(list(frames), ignore_index=True)
    df['_key'] = df['formula'].map(canonical_key)
    report: Dict[str, int] = {'input': len(df)}
    df = df[df['_key'].notna()]
    report['parseable'] = len(df)
    df = df[~df['_key'].isin(holdout_keys)]
    report['after_holdout_exclusion'] = len(df)
    df = df[~df['_key'].isin(existing_keys)]
    report['after_existing_exclusion'] = len(df)

    keep = []
    for _, grp in df.groupby('_key', sort=False):
        if len(grp) == 1:
            keep.append(grp.index[0])
            continue
        tcs = grp['Tc'].to_numpy(float)
        med = float(np.median(tcs))
        spread = float(tcs.max() - tcs.min())
        if spread <= tc_tol_frac * max(med, 1.0):
            keep.append(grp.index[int(np.argsort(tcs)[len(tcs) // 2])])
        else:
            pri = grp['dataset'].map(lambda d: _SOURCE_PRIORITY.get(d, 0))
            best = grp.index[int(np.argmax(pri.to_numpy()))]
            keep.append(best)
    out = df.loc[keep].drop(columns='_key').reset_index(drop=True)
    report['merged'] = len(out)
    report['conflicts_resolved'] = report['after_existing_exclusion'] - len(out)
    return out, report


def load_holdout_keys(json_path) -> Set[str]:
    """Canonical keys of the generative holdout set (never train on them)."""
    import json
    with open(json_path) as f:
        data = json.load(f)
    formulas = (data.get('holdout_formulas') or data.get('formulas')
                or [e.get('formula') for e in data.get('holdout_samples', [])
                    if isinstance(e, dict)])
    keys = {canonical_key(f) for f in formulas if f}
    keys.discard(None)
    return keys
