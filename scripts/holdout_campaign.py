#!/usr/bin/env python3
"""Sharded holdout-search campaign driver.

Runs scripts/holdout_search.py over the 45 holdout targets in sequential
per-window subprocesses and merges the shard JSONs. Two reasons this is a
wrapper instead of one process (reference runs everything in one process,
scripts/holdout/holdout_search_targeted.py:778):

- the experimental axon PJRT client leaks host memory per dispatch
  (~GBs/hour under the holdout workload), so a 45-target campaign in one
  process OOMs this 125GB box; fresh subprocesses bound the leak, and
  ``--target-offset`` keeps per-target rngs identical to an unsharded run.
- a shard crash (TPU worker restart) loses only its window; completed
  shard JSONs are kept and skipped on re-run.

Usage:
    python scripts/holdout_campaign.py --checkpoint outputs/run2/checkpoints/interrupt \
        --csv data/processed/jarvis_merged.csv.gz --budget 30000 \
        --window 5 --out results/run2/holdout_v2.json
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

N_HOLDOUT = 45


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--csv', required=True)
    p.add_argument('--budget', type=int, default=30000)
    p.add_argument('--window', type=int, default=5,
                   help='targets per subprocess')
    p.add_argument('--refine-rounds', type=int, default=2)
    p.add_argument('--guided-starts', type=int, default=32)
    p.add_argument('--sample-slice', type=int, default=4096)
    p.add_argument('--sample-draws', type=int, default=2)
    p.add_argument('--decode-chunk', type=int, default=2048)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--strategy-order', default='tiered',
                   choices=['tiered', 'inversion_first'])
    p.add_argument('--constrain-elements', action='store_true')
    p.add_argument('--shard-timeout', type=int, default=3600,
                   help='seconds per window subprocess')
    p.add_argument('--first-window', type=int, default=0,
                   help='window start index to process first; windows are '
                        'rotated so higher-value targets can run before a '
                        'possible crash/timeout eats the tail (shard outputs '
                        'are cached, so order does not affect results)')
    p.add_argument('--out', required=True)
    args = p.parse_args()

    out = Path(args.out)
    shard_dir = out.parent / (out.stem + '_shards')
    shard_dir.mkdir(parents=True, exist_ok=True)
    script = Path(__file__).resolve().parent / 'holdout_search.py'

    merged = []
    starts = list(range(0, N_HOLDOUT, args.window))
    pivot = next((i for i, s in enumerate(starts)
                  if s >= args.first_window), 0)
    run_order = starts[pivot:] + starts[:pivot]
    shard_results = {}
    for lo in run_order:
        n = min(args.window, N_HOLDOUT - lo)
        shard_out = shard_dir / f'shard_{lo:02d}.json'
        if shard_out.exists():
            print(f'[campaign] shard {lo}..{lo+n-1}: cached', flush=True)
        else:
            cmd = [sys.executable, '-u', str(script),
                   '--checkpoint', args.checkpoint, '--csv', args.csv,
                   '--budget', str(args.budget),
                   '--target-offset', str(lo), '--n-targets', str(n),
                   '--refine-rounds', str(args.refine_rounds),
                   '--guided-starts', str(args.guided_starts),
                   '--sample-slice', str(args.sample_slice),
                   '--sample-draws', str(args.sample_draws),
                   '--decode-chunk', str(args.decode_chunk),
                   '--seed', str(args.seed),
                   '--strategy-order', args.strategy_order,
                   '--out', str(shard_out)]
            if args.constrain_elements:
                cmd.append('--constrain-elements')
            print(f'[campaign] shard {lo}..{lo+n-1}: running', flush=True)
            try:
                rc = subprocess.run(cmd, timeout=args.shard_timeout).returncode
            except subprocess.TimeoutExpired:
                rc = -1
            if rc != 0 or not shard_out.exists():
                print(f'[campaign] shard {lo} FAILED rc={rc}', flush=True)
                continue
        shard_results[lo] = json.loads(shard_out.read_text())['results']
    for lo in starts:  # merge in target order regardless of run order
        merged.extend(shard_results.get(lo, []))

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from superconductor_vae_tpu.generation.holdout_search import (
        HoldoutResult, HoldoutSearch,
    )
    results = [HoldoutResult(**r) for r in merged]
    summary = HoldoutSearch.summarize(results)
    summary['n_missing'] = N_HOLDOUT - len(results)
    print(json.dumps(summary, indent=2))
    out.write_text(json.dumps(
        {'summary': summary, 'results': merged}, indent=2))


if __name__ == '__main__':
    main()
