#!/usr/bin/env python3
"""Multi-source dataset ingestion -> one processed training CSV.

Compact equivalent of the reference ingestion suite
(reference: scripts/ingest_jarvis.py, ingest_nemad.py,
ingest_new_datasets.py, ingest_non_sc.py, label_high_pressure.py — ~4.5K
LoC): reads raw source CSVs/TSVs, normalizes formula + Tc columns, dedups by
(formula, rounded Tc), merges non-SC negatives (Materials Project fallback
lists offline), applies the high-pressure labeling heuristics, and writes a
single contrastive training CSV.

Usage:
    python scripts/ingest.py --sources a.csv b.csv --out data/processed/train.csv
"""

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

FORMULA_COLS = ('formula', 'formula_pretty', 'composition', 'name',
                'chemical formula')
TC_COLS = ('Tc', 'tc', 'Tc (K)', 'critical_temperature', 'Tc_exp',
           'Tc (of this sample) recommended')

# SuperCon deficiency notation: "O4-Y"/"O3+X" mean O_{4-y}; keep the stated
# stoichiometry and drop the variable suffix
_DEFICIENCY_SUFFIX = re.compile(r'([+-][XYZ])+$', re.IGNORECASE)


def to_fraction_notation(formula: str) -> str:
    """Decimal formula -> the tokenizer's (p/q) fraction notation.

    Mirrors the reference's composition_to_fraction_formula
    (reference: scripts/ingest_jarvis.py:437-449): elements sorted, amounts
    via Fraction(amt).limit_denominator(1000), integers bare, fractions as
    El(p/q).  The processed-CSV formula column must be in this notation —
    the tokenizer has no decimal branch (decimals would tokenize as UNK).
    """
    from fractions import Fraction
    from superconductor_vae_tpu.data import parse_formula_composition
    comp = parse_formula_composition(formula)
    if not comp:
        return formula
    parts = []
    for el, amt in sorted(comp.items()):
        frac = Fraction(amt).limit_denominator(1000)
        if frac.denominator == 1:
            parts.append(el if frac.numerator == 1 else f'{el}{frac.numerator}')
        else:
            parts.append(f'{el}({frac})')
    return ''.join(parts)

# high-pressure labeling heuristics (reference: scripts/label_high_pressure.py)
_HP_HYDRIDE = re.compile(r'^(?=.*H(\d{2,}|[4-9]))')


def is_high_pressure(formula: str, tc: float) -> int:
    from superconductor_vae_tpu.data import parse_formula_composition
    comp = parse_formula_composition(formula)
    total = sum(comp.values()) or 1.0
    h_frac = comp.get('H', 0.0) / total
    # hydrogen-dominated high-Tc compounds are DAC-synthesized hydrides
    if h_frac > 0.5 and tc > 77:
        return 1
    # elemental HP superconductors (e.g., Ca, S, Se at megabar pressures)
    if len(comp) == 1 and tc > 10 and next(iter(comp)) in (
            'Ca', 'S', 'Se', 'P', 'B', 'Li', 'Y'):
        return 1
    return 0


def load_source(path: Path):
    import pandas as pd
    if path.suffix == '.tsv':
        # SuperCon-style TSVs carry a column-index line above the header
        df = pd.read_csv(path, sep='\t', skiprows=0)
        if not any(c in df.columns for c in FORMULA_COLS + TC_COLS):
            df = pd.read_csv(path, sep='\t', skiprows=1)
    else:
        df = pd.read_csv(path)
    fcol = next((c for c in FORMULA_COLS if c in df.columns), None)
    tcol = next((c for c in TC_COLS if c in df.columns), None)
    if fcol is None:
        print(f'  skip {path.name}: no formula column')
        return None
    out = df[[fcol] + ([tcol] if tcol else [])].copy()
    out.columns = ['formula'] + (['Tc'] if tcol else [])
    if 'Tc' not in out:
        out['Tc'] = 0.0
    out['formula'] = (out['formula'].astype(str).str.strip()
                      .str.replace(_DEFICIENCY_SUFFIX, '', regex=True))
    out['Tc'] = np.clip(
        np.nan_to_num(pd.to_numeric(out['Tc'], errors='coerce')), 0, 400)
    out = out[out['formula'].str.len() > 0]
    out['source'] = path.stem
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--sources', nargs='+', default=[],
                   help='generic CSV/TSV sources (column auto-detection)')
    p.add_argument('--out', required=True)
    # source-specific readers (data/ingest_sources.py — reference:
    # ingest_nemad.py + ingest_new_datasets.py). Each flag takes a local
    # file in that source's native export format.
    p.add_argument('--nemad', default=None,
                   help='NEMAD superconductor CSV (Chemical_Composition + '
                        'Median_Tc/free-text Tc; experimental rows only)')
    p.add_argument('--mdr', default=None,
                   help='MDR SuperCon (NIMS) primary.tsv')
    p.add_argument('--supercon2', default=None,
                   help='SuperCon2 literature-mined cleanup CSV')
    p.add_argument('--threedsc', default=None, help='3DSC_MP.csv')
    p.add_argument('--sodnet', default=None, help='SODNet SuperCon CSV')
    p.add_argument('--manual-hydrides', action='store_true',
                   help='append the 12 curated DAC hydride entries')
    p.add_argument('--exclude-existing', default=None,
                   help='already-processed CSV whose compositions are '
                        'skipped (incremental corpus growth)')
    p.add_argument('--add-non-sc', type=int, default=0,
                   help='append N non-SC negatives (Materials Project or '
                        'fallback lists)')
    p.add_argument('--non-sc-dft', default=None,
                   help='CSV of DFT-computed materials (e.g. JARVIS dft_3d, '
                        '76K rows) to sample non-SC negatives from — the '
                        'reference-scale negatives source (reference: '
                        'scripts/ingest_non_sc.py pulls ~23K negatives from '
                        'NEMAD + Materials Project; this environment has '
                        'no egress, JARVIS DFT ships locally)')
    p.add_argument('--non-sc-dft-n', type=int, default=0,
                   help='how many DFT negatives to sample; 0 = auto-balance '
                        'to the SC row count (the reference trains ~50/50, '
                        'train_v12_clean.py:934-941)')
    p.add_argument('--non-sc-max-ehull', type=float, default=0.2,
                   help='stability filter: skip DFT rows with energy above '
                        'hull over this (eV/atom) when the column exists')
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--min-tc-sc', type=float, default=0.0,
                   help='rows with Tc > this are labeled superconducting')
    p.add_argument('--featurize', action='store_true',
                   help='append Magpie-style composition feature columns '
                        '(chem/featurize.py) so the training pipeline has '
                        'numeric features without matminer')
    args = p.parse_args()

    import pandas as pd
    from superconductor_vae_tpu.data import parse_formula_composition
    from superconductor_vae_tpu.models.family_classifier import (
        RuleBasedFamilyClassifier, SuperconductorFamily,
    )
    from superconductor_vae_tpu.utils.materials_api import MaterialsProjectClient

    frames = []
    for s in args.sources:
        df = load_source(Path(s))
        if df is not None:
            frames.append(df)
            print(f'  {s}: {len(df)} rows')

    # source-specific readers -> normalized schema -> conflict-resolving
    # merge with holdout exclusion (data/ingest_sources.py)
    from superconductor_vae_tpu.data import ingest_sources as isrc
    specific = []
    for flag, reader in (('nemad', isrc.read_nemad), ('mdr', isrc.read_mdr),
                         ('supercon2', isrc.read_supercon2),
                         ('threedsc', isrc.read_threedsc),
                         ('sodnet', isrc.read_sodnet)):
        path = getattr(args, flag)
        if path:
            df = reader(path)
            specific.append(df)
            print(f'  {flag}: {len(df)} rows')
    if args.manual_hydrides:
        specific.append(isrc.manual_hydrides())
        print('  manual_hydrides: 12 rows')
    if specific:
        holdout_json = (Path(__file__).resolve().parents[1] / 'data'
                        / 'GENERATIVE_HOLDOUT_DO_NOT_TRAIN.json')
        holdout = (isrc.load_holdout_keys(holdout_json)
                   if holdout_json.exists() else frozenset())
        existing = frozenset()
        if args.exclude_existing:
            prev = pd.read_csv(args.exclude_existing)
            existing = {isrc.canonical_key(f) for f in prev['formula']}
            existing.discard(None)
        sdf, rep = isrc.merge_sources(specific, holdout_keys=holdout,
                                      existing_keys=existing)
        print(f'  merge_sources: {rep}')
        sdf = sdf.rename(columns={'dataset': 'source'})
        frames.append(sdf[['formula', 'Tc', 'source']])
    if not frames:
        p.error('no input rows: pass --sources and/or a specific-source flag')
    merged = pd.concat(frames, ignore_index=True)

    # drop unparseable formulas + dedup by (formula, Tc rounded)
    merged = merged[merged['formula'].map(
        lambda f: len(parse_formula_composition(f)) > 0)]
    # canonical (p/q) notation — the tokenizer's input format
    merged['formula'] = merged['formula'].map(to_fraction_notation)
    merged['tc_key'] = merged['Tc'].round(1)
    merged = merged.drop_duplicates(['formula', 'tc_key']).drop(columns='tc_key')

    merged['is_superconductor'] = (merged['Tc'] > args.min_tc_sc).astype(int)
    merged['requires_high_pressure'] = [
        is_high_pressure(f, tc) if sc else 0
        for f, tc, sc in zip(merged['formula'], merged['Tc'],
                             merged['is_superconductor'])]

    clf = RuleBasedFamilyClassifier()
    fam_to_cat = {
        2: 'Cuprates', 3: 'Cuprates', 4: 'Cuprates', 5: 'Cuprates',
        6: 'Cuprates', 7: 'Cuprates', 8: 'Iron-based', 9: 'Iron-based',
        1: 'Elemental Superconductors', 10: 'Other', 11: 'Other',
        12: 'Organic Superconductors', 13: 'Other',
    }

    def category(row):
        if not row['is_superconductor']:
            return 'Non-SC: Materials Project'
        comp = parse_formula_composition(row['formula'])
        if comp.get('H', 0) / (sum(comp.values()) or 1) > 0.5:
            return 'Hydrogen-rich Superconductors'
        fam = int(clf.classify_from_elements(set(comp)))
        return fam_to_cat.get(fam, 'Other')

    merged['category'] = merged.apply(category, axis=1)

    if args.add_non_sc:
        neg = MaterialsProjectClient().fetch_non_sc(args.add_non_sc)
        neg_df = pd.DataFrame([{
            'formula': d['formula'], 'Tc': 0.0, 'source': 'materials_api',
            'is_superconductor': 0, 'requires_high_pressure': 0,
            'category': d['category']} for d in neg])
        merged = pd.concat([merged, neg_df], ignore_index=True)

    if args.non_sc_dft:
        from superconductor_vae_tpu.data.pipeline import (
            MAX_ELEMENTS, canonical_composition_key,
        )
        dft = pd.read_csv(args.non_sc_dft)
        fcol = next(c for c in FORMULA_COLS if c in dft.columns)
        if 'ehull' in dft.columns:
            eh = pd.to_numeric(dft['ehull'], errors='coerce')
            dft = dft[eh.fillna(1e9) <= args.non_sc_max_ehull]
        # a material SCREENED for superconductivity anywhere in the merged
        # sources (even at Tc=0) must not re-enter as a DFT negative, and
        # no negative may collide with an SC composition or a holdout
        # target — all at composition level (spelling-independent)
        known = {canonical_composition_key(f) for f in merged['formula']}
        from superconductor_vae_tpu.data.pipeline import load_holdout_formulas
        known |= {canonical_composition_key(f)
                  for f in load_holdout_formulas()}
        known.discard(None)
        rows, seen = [], set()
        # .str.strip() propagates the source column's NaNs as floats even
        # after astype(str) — drop them explicitly
        cand = [c for c in dft[fcol].fillna('').astype(str)
                .str.strip().tolist() if c]
        rng = np.random.default_rng(args.seed)
        rng.shuffle(cand)
        n_sc = int((merged['Tc'] > args.min_tc_sc).sum())
        n_have = int((merged['Tc'] <= args.min_tc_sc).sum())
        want = args.non_sc_dft_n or max(n_sc - n_have, 0)
        for f in cand:
            comp = parse_formula_composition(f)
            if not comp or len(comp) > MAX_ELEMENTS:
                continue
            spelled = to_fraction_notation(f)
            k = canonical_composition_key(spelled)
            if k is None or k in known or k in seen:
                continue
            seen.add(k)
            rows.append({'formula': spelled, 'Tc': 0.0,
                         'source': 'jarvis_dft_3d',
                         'is_superconductor': 0,
                         'requires_high_pressure': 0,
                         'category': 'Non-SC: Materials Project'})
            if len(rows) >= want:
                break
        print(f'  DFT negatives: {len(rows)} sampled '
              f'(want {want}; SC rows {n_sc}, prior negatives {n_have})')
        merged = pd.concat([merged, pd.DataFrame(rows)], ignore_index=True)

    if args.featurize:
        from superconductor_vae_tpu.chem import (FEATURE_NAMES,
                                                 featurize_formulas)
        feats = featurize_formulas(merged['formula'].tolist())
        for i, name in enumerate(FEATURE_NAMES):
            merged[name] = feats[:, i]
        print(f'  featurized: {feats.shape[1]} columns')

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    merged.to_csv(out, index=False)
    n_sc = int(merged['is_superconductor'].sum())
    print(f'wrote {len(merged)} rows ({n_sc} SC, {len(merged)-n_sc} non-SC, '
          f"{int(merged['requires_high_pressure'].sum())} HP) -> {out}")


if __name__ == '__main__':
    main()
