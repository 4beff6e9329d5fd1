#!/usr/bin/env python3
"""Re-run non-exact holdout targets at an elevated search budget.

Reads a streaming campaign JSONL (scripts/holdout_search.py --stream),
selects the targets that did not match exactly — nearest misses first,
where a fraction-refinement zoom is most likely to flip the result —
and re-runs each as its own subprocess (`--target-offset i --n-targets 1`)
appending to the SAME stream file.  scripts/holdout_summarize.py dedups
by index keeping the best record, so a rerun can only improve the
summary.  Sequential subprocesses also sidestep the axon PJRT client's
per-dispatch host-memory leak on very long campaigns (same rationale as
the reference's window sharding, holdout_search_targeted.py:778).

Usage:
    python scripts/holdout_rerun_misses.py \
        --stream results/run3/holdout_stream.jsonl \
        --checkpoint outputs/run3/checkpoints/interrupt \
        --budget 24000 --refine-rounds 2 [--max-targets 8] [--dry-run]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from holdout_summarize import summarize  # noqa: E402  (dedup logic shared)


def pick_misses(stream_path: str, max_targets: int | None) -> list[dict]:
    records = [json.loads(line) for line in open(stream_path)
               if line.strip()]
    rows = summarize(records)['per_target']
    misses = [r for r in rows if not r.get('exact')]
    misses.sort(key=lambda r: -float(r.get('best_similarity', 0.0)))
    return misses[:max_targets] if max_targets else misses


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--stream', required=True)
    ap.add_argument('--checkpoint', required=True)
    ap.add_argument('--csv', default='data/processed/jarvis_merged.csv.gz')
    ap.add_argument('--budget', type=int, default=24000)
    ap.add_argument('--refine-rounds', type=int, default=2)
    ap.add_argument('--guided-starts', type=int, default=24)
    ap.add_argument('--seed', type=int, default=1,
                    help='different seed than the base campaign so the '
                         'rerun explores fresh perturbations')
    ap.add_argument('--strategy-order', default='tiered',
                    choices=['tiered', 'inversion_first'])
    ap.add_argument('--constrain-elements', action='store_true')
    ap.add_argument('--max-targets', type=int, default=None)
    ap.add_argument('--timeout', type=int, default=2400,
                    help='per-target wall cap in seconds')
    ap.add_argument('--dry-run', action='store_true',
                    help='print the rerun plan without launching')
    args = ap.parse_args()

    misses = pick_misses(args.stream, args.max_targets)
    print(f'{len(misses)} non-exact targets queued '
          f'(budget {args.budget}, refine {args.refine_rounds}):')
    for r in misses:
        print(f"  [{r['index']}] sim={r['best_similarity']:.4f} "
              f"{r['target']}")
    if args.dry_run:
        return

    for r in misses:
        idx = int(r['index'])
        cmd = [sys.executable, '-u', 'scripts/holdout_search.py',
               '--checkpoint', args.checkpoint, '--csv', args.csv,
               '--budget', str(args.budget),
               '--refine-rounds', str(args.refine_rounds),
               '--guided-starts', str(args.guided_starts),
               '--seed', str(args.seed),
               '--target-offset', str(idx), '--n-targets', '1',
               '--strategy-order', args.strategy_order,
               '--stream', args.stream,
               '--out', f'/tmp/holdout_rerun_{idx}.json']
        if args.constrain_elements:
            cmd.append('--constrain-elements')
        print(f'--- rerun [{idx}] {r["target"]}', flush=True)
        try:
            subprocess.run(cmd, timeout=args.timeout, check=False)
        except subprocess.TimeoutExpired:
            print(f'[{idx}] timed out after {args.timeout}s; '
                  'stream keeps the original record', flush=True)


if __name__ == '__main__':
    main()
