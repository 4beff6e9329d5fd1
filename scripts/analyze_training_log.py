#!/usr/bin/env python3
"""Training-log analytics: mine training_metrics.csv for peaks, plateaus,
drops, phases, milestones, trends, and controller activity.

Behavioral equivalent of the reference analyzer
(reference: scripts/analysis/analyze_training_log.py:82-515 — peak
exact/true-exact, loss-transition detection, phase analysis, milestone
tables, recent-trend, event detection, key observations).

Usage:
    python scripts/analyze_training_log.py outputs/run3/training_metrics.csv
"""

import argparse

import numpy as np

NEAR_ZERO = 1e-3


def hr(title):
    print('=' * 78)
    print(title)
    print('=' * 78)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('csv')
    p.add_argument('--plateau-window', type=int, default=20)
    p.add_argument('--plateau-threshold', type=float, default=0.01)
    p.add_argument('--trend-window', type=int, default=50)
    p.add_argument('--table-every', type=int, default=25)
    args = p.parse_args()

    import pandas as pd
    df = pd.read_csv(args.csv)
    # resumed runs append; keep the last occurrence of each epoch
    if 'epoch' in df:
        df = df.drop_duplicates('epoch', keep='last').reset_index(drop=True)
    if df.empty:
        print('empty log')
        return
    obs = []

    # -- peaks ---------------------------------------------------------------
    hr('PEAKS')
    for col in ('exact_match', 'true_ar_exact'):
        if col not in df:
            continue
        i = int(df[col].idxmax())
        r = df.iloc[i]
        print(f"  peak {col}: {r[col]:.4f} ({r[col]*100:.2f}%) at epoch "
              f"{int(r['epoch'])} (loss {r['total']:.3f})")
        obs.append(f'peak {col} {r[col]*100:.2f}% @ {int(r["epoch"])}')
    print(f"  final: exact={df['exact_match'].iloc[-1]:.4f} "
          f"AR={df['true_ar_exact'].iloc[-1]:.4f} "
          f"epoch {int(df['epoch'].iloc[-1])}")

    # -- loss transitions (when terms reached ~0) ----------------------------
    hr('LOSS TRANSITIONS (first epoch each term dropped under 1e-3)')
    loss_cols = [c for c in df.columns
                 if c.endswith('_loss') or c in ('total', 'entropy')]
    for col in loss_cols:
        v = df[col].values
        if not np.isfinite(v).any():
            print(f'  {col}: no data')
            continue
        if np.nanmax(np.abs(v)) < NEAR_ZERO:
            print(f'  {col}: always ~0 (max {np.nanmax(np.abs(v)):.2e})')
            continue
        under = np.where(np.abs(v) < NEAR_ZERO)[0]
        if len(under):
            print(f'  {col}: first ~0 at epoch {int(df["epoch"].iloc[under[0]])} '
                  f'(start {v[0]:.3f})')
        else:
            print(f'  {col}: {v[0]:.3f} -> {v[-1]:.4f} (never ~0)')

    # -- phases from controller activations ----------------------------------
    hr('PHASES (controller activations)')
    bounds = [(0, 'warmup/TF')]
    for col, name in (('rl_weight', 'RL'), ('physz_weight', 'physics-Z')):
        if col in df and (df[col] > 0).any():
            on = int(df['epoch'].iloc[df.index[df[col] > 0][0]])
            bounds.append((on, name))
            obs.append(f'{name} activated @ {on}')
    bounds.sort()
    for i, (start, name) in enumerate(bounds):
        end = bounds[i + 1][0] - 1 if i + 1 < len(bounds) \
            else int(df['epoch'].iloc[-1])
        seg = df[(df['epoch'] >= start) & (df['epoch'] <= end)]
        if seg.empty:
            continue
        print(f"  [{start:4d}-{end:4d}] +{name}: exact "
              f"{seg['exact_match'].iloc[0]:.3f}->{seg['exact_match'].iloc[-1]:.3f}"
              f"  AR {seg['true_ar_exact'].iloc[0]:.3f}->"
              f"{seg['true_ar_exact'].iloc[-1]:.3f}"
              f"  {seg['samples_per_s'].mean():7.1f} samples/s")

    # -- milestones ----------------------------------------------------------
    hr('MILESTONES (first epoch exact_match crossed each level)')
    for level in (0.10, 0.25, 0.50, 0.75, 0.85, 0.90, 0.93):
        hit = df.index[df['exact_match'] >= level]
        if len(hit):
            r = df.iloc[hit[0]]
            print(f"  {level:.0%}: epoch {int(r['epoch'])} "
                  f"(AR {r['true_ar_exact']:.3f}, lr {r['lr']:.2e})")

    # -- plateaus ------------------------------------------------------------
    hr(f'PLATEAUS (<{args.plateau_threshold} gain over '
       f'{args.plateau_window} epochs)')
    ex = df['exact_match'].values
    w = args.plateau_window
    start = None
    plateaus = []
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
        print(f'  epochs {int(df["epoch"].iloc[s])}-{int(df["epoch"].iloc[e])} '
              f'at exact~{ex[s]:.3f}')

    # -- major events (sudden drops/spikes, any metric) ----------------------
    hr('MAJOR EVENTS (|delta| > 5x rolling std)')
    events = 0
    for col in ('exact_match', 'true_ar_exact', 'total', 'entropy'):
        if col not in df or len(df) < 12:
            continue
        v = df[col].values
        d = np.diff(v)
        roll = max(float(np.std(d[:max(len(d) // 2, 5)])), 1e-6)
        big = np.where(np.abs(d) > 5 * roll)[0]
        for i in big[:5]:
            print(f'  {col} @ epoch {int(df["epoch"].iloc[i + 1])}: '
                  f'{v[i]:.3f} -> {v[i + 1]:.3f}')
            events += 1
    if not events:
        print('  none')
    drops = np.where(np.diff(ex) < -0.05)[0]
    for d in drops[:5]:
        obs.append(f'catastrophic exact drop @ {int(df["epoch"].iloc[d + 1])}')

    # -- recent trend --------------------------------------------------------
    hr(f'RECENT TREND (last {args.trend_window} epochs)')
    tail = df.tail(args.trend_window)
    for col in ('exact_match', 'true_ar_exact', 'total', 'lr', 'entropy',
                'mean_reward'):
        if col not in tail or len(tail) < 3:
            continue
        v = tail[col].values
        slope = np.polyfit(np.arange(len(v)), v, 1)[0]
        print(f'  {col:16s} {v[0]:10.4f} -> {v[-1]:10.4f}  '
              f'({slope:+.2e}/epoch)')

    # -- periodic table ------------------------------------------------------
    hr(f'EPOCH TABLE (every {args.table_every})')
    print('  epoch   exact     AR     total      lr      rl_w   samples/s')
    sel = df[df['epoch'] % args.table_every == 0]
    for _, r in sel.iterrows():
        print(f"  {int(r['epoch']):5d}  {r['exact_match']:.4f}  "
              f"{r['true_ar_exact']:.4f}  {r['total']:8.3f}  "
              f"{r['lr']:.2e}  {r.get('rl_weight', 0.0):6.3f}  "
              f"{r['samples_per_s']:9.1f}")

    # -- correlations --------------------------------------------------------
    num = df.select_dtypes('number')
    if 'exact_match' in num and len(df) > 5:
        corr = num.corr()['exact_match'].drop('exact_match').sort_values()
        hr('CORRELATION WITH exact_match')
        print('  most negative:',
              ', '.join(f'{k}={v:.2f}' for k, v in corr.head(3).items()))
        print('  most positive:',
              ', '.join(f'{k}={v:.2f}' for k, v in corr.tail(3).items()))

    hr('KEY OBSERVATIONS')
    print(f"  epochs: {len(df)}  throughput mean "
          f"{df['samples_per_s'].mean():.1f}/s  epoch time mean "
          f"{df['epoch_time_s'].mean():.2f}s")
    for o in obs:
        print(f'  - {o}')


if __name__ == '__main__':
    main()
