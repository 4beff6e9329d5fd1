#!/usr/bin/env python3
"""Fit the native-78-dim -> reference-Magpie-layout linear bridge.

Bridges the featurizer split between the reference corpus (matminer Magpie,
145/151 columns — reference: scripts/ingest_new_datasets.py) and this repo's
matminer-free descriptor (chem/featurize.py, 78 columns) so converted
reference checkpoints can be evaluated / fine-tuned on natively-featurized
corpora:

    python scripts/fit_magpie_bridge.py \
        --ref-csv /root/reference/data/processed/new_sc_datasets.csv \
        --out data/magpie_bridge.npz
    python - <<'PY'
    from superconductor_vae_tpu.data import load_dataset
    ds = load_dataset('data/processed/jarvis_merged.csv.gz',
                      magpie_bridge='data/magpie_bridge.npz')
    PY
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ref-csv',
                   default='/root/reference/data/processed/new_sc_datasets.csv')
    p.add_argument('--out', default='data/magpie_bridge.npz')
    p.add_argument('--limit', type=int, default=None)
    args = p.parse_args()

    import numpy as np
    from superconductor_vae_tpu.chem.featurize import fit_magpie_bridge

    b = fit_magpie_bridge(args.ref_csv, out_path=args.out, limit=args.limit)
    r2 = b['r2']
    print(f'bridge: {b["w"].shape[0] - 1} -> {b["w"].shape[1]} columns')
    print(f'R2 mean={r2.mean():.3f} median={np.median(r2):.3f} '
          f'(>0.5: {(r2 > 0.5).sum()}/{len(r2)})')
    print(f'saved {args.out}')


if __name__ == '__main__':
    main()
