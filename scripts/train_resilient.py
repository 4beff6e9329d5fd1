#!/usr/bin/env python3
"""Crash- and hang-resilient training driver: relaunch-with-resume.

The axon TPU tunnel intermittently kills the PJRT client (worker restarts,
Rust panics) — and sometimes silently WEDGES: the client blocks forever on
a dispatch with no error (observed twice on run2: a holdout search with
3.8 MB stuck in the socket recv queue, and epoch 405 stalling 18+ min at
~20% CPU).  Once either happens the process cannot recover.  This wrapper
is the elastic-recovery layer (SURVEY.md §5.3):

- crash: child exits nonzero -> relaunch with ``--resume auto``
- hang: the run's ``training_metrics.csv`` mtime goes stale for longer
  than ``--stall-timeout`` -> kill the child, relaunch with resume

Usage:
    python scripts/train_resilient.py --stall-timeout 900 -- \
        --epochs 1000 --batch-size 128 --output outputs/run2 ...
"""

import argparse
import subprocess
import sys
import time
from pathlib import Path


def _metrics_path(train_args):
    out = 'outputs'
    for i, a in enumerate(train_args):
        if a == '--output' and i + 1 < len(train_args):
            out = train_args[i + 1]
        elif a.startswith('--output='):
            out = a.split('=', 1)[1]
    return Path(out) / 'training_metrics.csv'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--max-restarts', type=int, default=20)
    p.add_argument('--cooldown', type=float, default=30.0,
                   help='seconds to wait before relaunch (worker recovery)')
    p.add_argument('--stall-timeout', type=float, default=1200.0,
                   help='kill+relaunch if training_metrics.csv has not '
                        'grown for this many seconds (0 = disable). Must '
                        'comfortably exceed the slowest epoch incl. '
                        'first-compile, eval, and Phase-2 sub-epochs')
    args, train_args = p.parse_known_args()
    if train_args and train_args[0] == '--':
        train_args = train_args[1:]

    metrics = _metrics_path(train_args)
    base = [sys.executable, str(Path(__file__).parent / 'train.py')] + train_args
    for attempt in range(args.max_restarts + 1):
        cmd = list(base)
        if attempt > 0 and '--resume' not in cmd:
            cmd += ['--resume', 'auto']
        print(f'[resilient] attempt {attempt}: {" ".join(cmd)}', flush=True)
        child = subprocess.Popen(cmd)
        start = time.time()
        stalled = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            if args.stall_timeout > 0:
                try:
                    last = metrics.stat().st_mtime
                except OSError:
                    last = start          # no CSV yet: count from launch
                ref = max(last, start)    # grace for startup/compile
                if time.time() - ref > args.stall_timeout:
                    print(f'[resilient] STALL: no metrics progress for '
                          f'{args.stall_timeout:.0f}s; killing child',
                          flush=True)
                    child.kill()
                    child.wait()
                    rc, stalled = -1, True
                    break
            time.sleep(15.0)
        if rc == 0:
            print('[resilient] finished cleanly', flush=True)
            return 0
        why = 'stalled' if stalled else f'exited rc={rc}'
        print(f'[resilient] {why}; relaunching after cooldown', flush=True)
        time.sleep(args.cooldown)
    print('[resilient] giving up after max restarts', flush=True)
    return 1


if __name__ == '__main__':
    sys.exit(main())
