#!/usr/bin/env python3
"""One-command, resumable holdout-campaign driver.

Runs scripts/holdout_search.py over the 45 holdout targets in sequential
per-window subprocesses, streams every finished target (with ``found_by``
+ ``exact_tier`` + seed + budget provenance) to a JSONL, optionally
re-runs the remaining misses at escalating budgets, and writes the final
tier-stratified summary.  Two reasons the windows are subprocesses
(the reference runs everything in one process,
scripts/holdout/holdout_search_targeted.py:778):

- the experimental axon PJRT client leaks host memory per dispatch
  (~GBs/hour under the holdout workload), so a 45-target campaign in one
  process OOMs this 125GB box; fresh subprocesses bound the leak, and
  ``--target-offset`` keeps per-target rngs identical to an unsharded run.
- a shard crash (TPU worker restart) loses only its window; completed
  shard JSONs are kept and skipped on re-run, and the stream keeps every
  finished target even if its window dies mid-way.

One command regenerates a summary from scratch:
    python scripts/holdout_campaign.py \
        --checkpoint results/run4/ckpt_snapshot \
        --csv data/processed/jarvis_merged.csv.gz --budget 8192 \
        --escalate 12000 16000 --window 5 \
        --stream results/run5/holdout_stream.jsonl \
        --out results/run5/holdout_summary.json
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
    p.add_argument('--no-guided', action='store_true',
                   help='skip the guided tier (passthrough to '
                        'holdout_search.py): tier table then reads '
                        'navigation -> inversion')
    p.add_argument('--no-inverse', action='store_true')
    p.add_argument('--no-oracle', action='store_true',
                   help='skip the in-campaign oracle diagnostic (~30% of '
                        'target wall; the standalone --oracle-only run '
                        'publishes the same number)')
    p.add_argument('--inversion-steps', type=int, default=384)
    p.add_argument('--constrain-elements', action='store_true')
    p.add_argument('--no-snap-stoich', action='store_true',
                   help='disable rational-snap of predicted stoich decode '
                        'conditioning (round-5 default ON)')
    p.add_argument('--shard-timeout', type=int, default=3600,
                   help='seconds per window subprocess')
    p.add_argument('--first-window', type=int, default=0,
                   help='window start index to process first; windows are '
                        'rotated so higher-value targets can run before a '
                        'possible crash/timeout eats the tail (shard outputs '
                        'are cached, so order does not affect results)')
    p.add_argument('--stream', default=None,
                   help='JSONL receiving every finished target as it lands '
                        '(passed through to holdout_search.py --stream); '
                        'default: <out stem>_stream.jsonl')
    p.add_argument('--escalate', type=int, nargs='*', default=[],
                   help='after the base pass, re-run remaining misses '
                        'per-target at these budgets in order (the round-2 '
                        'autoloop, folded in; the stream dedup keeps the '
                        'best record per target)')
    p.add_argument('--escalate-timeout', type=int, default=2400,
                   help='per-target wall cap for escalation reruns')
    p.add_argument('--out', required=True)
    args = p.parse_args()

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    shard_dir = out.parent / (out.stem + '_shards')
    shard_dir.mkdir(parents=True, exist_ok=True)
    stream = Path(args.stream) if args.stream \
        else out.parent / (out.stem + '_stream.jsonl')
    script = Path(__file__).resolve().parent / 'holdout_search.py'

    def base_cmd(budget, seed):
        cmd = [sys.executable, '-u', str(script),
               '--checkpoint', args.checkpoint, '--csv', args.csv,
               '--budget', str(budget),
               '--refine-rounds', str(args.refine_rounds),
               '--guided-starts', str(args.guided_starts),
               '--sample-slice', str(args.sample_slice),
               '--sample-draws', str(args.sample_draws),
               '--decode-chunk', str(args.decode_chunk),
               '--seed', str(seed),
               '--strategy-order', args.strategy_order,
               '--inversion-steps', str(args.inversion_steps),
               '--stream', str(stream)]
        if args.no_guided:
            cmd.append('--no-guided')
        if args.no_inverse:
            cmd.append('--no-inverse')
        if args.constrain_elements:
            cmd.append('--constrain-elements')
        if args.no_snap_stoich:
            cmd.append('--no-snap-stoich')
        if args.no_oracle:
            cmd.append('--no-oracle')
        return cmd

    def streamed_at_budget():
        """Target indices already completed in the stream at >= this
        campaign's budget — per-TARGET resume so a shard killed mid-window
        never re-runs (and never re-streams) its finished targets."""
        done = set()
        if stream.exists():
            for line in stream.read_text().splitlines():
                if not line:
                    continue
                r = json.loads(line)
                if int(r.get('budget', 0)) >= args.budget:
                    done.add(int(r.get('index', -1)))
        return done

    starts = list(range(0, N_HOLDOUT, args.window))
    pivot = next((i for i, s in enumerate(starts)
                  if s >= args.first_window), 0)
    run_order = starts[pivot:] + starts[:pivot]
    for lo in run_order:
        n = min(args.window, N_HOLDOUT - lo)
        shard_out = shard_dir / f'shard_{lo:02d}.json'
        if shard_out.exists():
            print(f'[campaign] shard {lo}..{lo+n-1}: cached', flush=True)
            continue
        done = streamed_at_budget()
        missing = [i for i in range(lo, lo + n) if i not in done]
        if not missing:
            print(f'[campaign] shard {lo}..{lo+n-1}: all targets already '
                  f'streamed', flush=True)
            continue
        # contiguous missing runs -> one subprocess each (the search CLI
        # addresses targets by offset+count)
        runs = []
        for i in missing:
            if runs and i == runs[-1][0] + runs[-1][1]:
                runs[-1][1] += 1
            else:
                runs.append([i, 1])
        rc = 0
        for r_lo, r_n in runs:
            cmd = base_cmd(args.budget, args.seed) + [
                '--target-offset', str(r_lo), '--n-targets', str(r_n),
                '--out', str(shard_dir / f'run_{r_lo:02d}_{r_n}.json')]
            print(f'[campaign] targets {r_lo}..{r_lo+r_n-1}: running',
                  flush=True)
            try:
                rc = subprocess.run(
                    cmd, timeout=args.shard_timeout).returncode
            except subprocess.TimeoutExpired:
                rc = -1
            if rc != 0:
                print(f'[campaign] targets {r_lo}..{r_lo+r_n-1} FAILED '
                      f'rc={rc} (finished targets live in the stream)',
                      flush=True)
        if rc == 0:
            # marker only — the per-target records live in the stream
            shard_out.write_text(json.dumps({'targets': list(range(
                lo, lo + n)), 'via': 'stream'}))

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from holdout_summarize import summarize  # noqa: E402

    def stream_rows():
        if not stream.exists():
            return []
        return [json.loads(x) for x in stream.read_text().splitlines() if x]

    # escalation passes: re-attack the remaining misses per-target with a
    # bigger budget and a fresh seed; the stream dedup (best record per
    # index) means a rerun can only improve the summary
    for round_i, budget in enumerate(args.escalate):
        rows = summarize(stream_rows())['per_target']
        misses = [r for r in rows if not r.get('exact')]
        misses.sort(key=lambda r: -float(r.get('best_similarity', 0.0)))
        if not misses:
            break
        print(f'[campaign] escalation budget={budget}: '
              f'{len(misses)} misses', flush=True)
        for r in misses:
            idx = int(r['index'])
            cmd = base_cmd(budget, args.seed + round_i + 1) + [
                '--target-offset', str(idx), '--n-targets', '1',
                '--out', str(shard_dir / f'rerun_{budget}_{idx:02d}.json')]
            try:
                subprocess.run(cmd, timeout=args.escalate_timeout)
            except subprocess.TimeoutExpired:
                print(f'[campaign] rerun [{idx}] timed out', flush=True)

    summary = summarize(stream_rows())
    summary = {
        'checkpoint': args.checkpoint, 'budget': args.budget,
        'escalate': args.escalate, 'seed': args.seed,
        'strategy_order': args.strategy_order,
        'n_missing': N_HOLDOUT - summary['targets_completed'],
        **summary,
    }
    print(json.dumps({k: v for k, v in summary.items()
                      if k != 'per_target'}, indent=2))
    out.write_text(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
