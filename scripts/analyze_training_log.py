#!/usr/bin/env python3
"""Training-log analytics: mine training_metrics.csv for plateaus, drops,
throughput, and controller activity.

Compact equivalent of the reference analyzers
(reference: scripts/analysis/analyze_training_log.py, 515 LoC, and
analyze_error_reports.py).

Usage:
    python scripts/analyze_training_log.py outputs/training_metrics.csv
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('csv')
    p.add_argument('--plateau-window', type=int, default=20)
    p.add_argument('--plateau-threshold', type=float, default=0.01)
    args = p.parse_args()

    import pandas as pd
    df = pd.read_csv(args.csv)
    if df.empty:
        print('empty log')
        return

    print(f'epochs: {len(df)}  '
          f"final exact={df['exact_match'].iloc[-1]:.3f}  "
          f"best exact={df['exact_match'].max():.3f}  "
          f"final AR={df['true_ar_exact'].iloc[-1]:.3f}")
    print(f"throughput: mean {df['samples_per_s'].mean():.1f}/s  "
          f"epoch time mean {df['epoch_time_s'].mean():.2f}s")

    # plateaus: windows with < threshold improvement
    ex = df['exact_match'].values
    w = args.plateau_window
    plateaus = []
    start = None
    for i in range(w, len(ex)):
        if ex[i] - ex[i - w] < args.plateau_threshold:
            if start is None:
                start = i - w
        elif start is not None:
            plateaus.append((start, i))
            start = None
    if start is not None:
        plateaus.append((start, len(ex) - 1))
    for s, e in plateaus[:10]:
        print(f'  plateau epochs {s}-{e} at exact~{ex[s]:.3f}')

    # catastrophic drops
    drops = np.where(np.diff(ex) < -0.05)[0]
    for d in drops[:10]:
        print(f'  drop at epoch {d + 1}: {ex[d]:.3f} -> {ex[d + 1]:.3f}')

    # controller activity
    if 'rl_weight' in df and (df['rl_weight'] > 0).any():
        on = df.index[df['rl_weight'] > 0][0]
        print(f'  RL activated at epoch {df["epoch"].iloc[on]}')
    if 'physz_weight' in df and (df['physz_weight'] > 0).any():
        on = df.index[df['physz_weight'] > 0][0]
        print(f'  physics-Z activated at epoch {df["epoch"].iloc[on]}')

    # loss correlation snapshot
    num = df.select_dtypes('number')
    if 'exact_match' in num and len(df) > 5:
        corr = num.corr()['exact_match'].drop('exact_match').sort_values()
        print('most anti-correlated with exact:',
              ', '.join(f'{k}={v:.2f}' for k, v in corr.head(3).items()))


if __name__ == '__main__':
    main()
