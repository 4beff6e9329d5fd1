#!/usr/bin/env python3
"""Build fraction / isotope vocabularies from a training CSV.

Equivalent of the reference builders
(reference: scripts/build_fraction_vocab.py and build_isotope_vocab.py):
scans every formula for ``(p/q)`` fractions, GCD-canonicalizes, orders by
descending frequency, and emits data/fraction_vocab.json; the isotope vocab
enumerates the isotope database in mass order per element.

Usage:
    python scripts/build_vocab.py --csv <training.csv> --out data/
"""

import argparse
import json
import math
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_FRAC = re.compile(r'\((\d+)/(\d+)\)')


def build_fraction_vocab(formulas, out_path: Path):
    counts = Counter()
    for f in formulas:
        for m in _FRAC.finditer(str(f)):
            p, q = int(m.group(1)), int(m.group(2))
            g = math.gcd(p, q) or 1
            counts[f'{p // g}/{q // g}'] += 1
    ordered = [frac for frac, _ in counts.most_common()]
    total = sum(counts.values())

    def coverage(top_pct):
        target = total * top_pct
        acc = 0
        for i, (_, c) in enumerate(counts.most_common(), 1):
            acc += c
            if acc >= target:
                return i
        return len(ordered)

    blob = {
        'version': 'V13.0',
        'description': 'Semantic fraction vocabulary (frequency-ordered)',
        'n_formulas': len(formulas),
        'n_fractions': len(ordered),
        'total_fraction_occurrences': total,
        'coverage': {f'top_{p}pct': coverage(p / 100)
                     for p in (50, 90, 95, 99, 100)},
        'fractions': ordered,
    }
    out_path.write_text(json.dumps(blob, indent=2))
    print(f'fraction vocab: {len(ordered)} fractions '
          f'({total} occurrences) -> {out_path}')


def build_isotope_vocab(out_path: Path):
    from superconductor_vae_tpu.chem.isotopes import ISOTOPES
    blob = {
        'version': 'V14.0',
        'description': 'Isotope vocabulary — single semantic token per isotope',
        'n_isotopes': len(ISOTOPES),
        'isotopes': list(ISOTOPES),
    }
    out_path.write_text(json.dumps(blob, indent=2))
    print(f'isotope vocab: {len(ISOTOPES)} isotopes -> {out_path}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--csv', required=True)
    p.add_argument('--out', default='data')
    p.add_argument('--formula-column', default='formula')
    args = p.parse_args()

    import pandas as pd
    df = pd.read_csv(args.csv)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    build_fraction_vocab(df[args.formula_column].tolist(),
                         out / 'fraction_vocab.json')
    build_isotope_vocab(out / 'isotope_vocab.json')


if __name__ == '__main__':
    main()
