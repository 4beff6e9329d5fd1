#!/usr/bin/env python3
"""Crash-resilient training driver: relaunch-with-resume on failures.

The axon TPU tunnel intermittently kills the PJRT client (worker restarts,
Rust panics); once that happens the process cannot recover.  This wrapper is
the elastic-recovery layer (SURVEY.md §5.3): it runs scripts/train.py as a
subprocess and relaunches with ``--resume auto`` whenever it dies before
finishing, up to --max-restarts.

Usage:
    python scripts/train_resilient.py --epochs 400 --batch-size 128 \
        --lr 3e-4 --output outputs/run1 -- --checkpoint-interval 10
"""

import argparse
import subprocess
import sys
import time
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--max-restarts', type=int, default=20)
    p.add_argument('--cooldown', type=float, default=30.0,
                   help='seconds to wait before relaunch (worker recovery)')
    args, train_args = p.parse_known_args()
    if train_args and train_args[0] == '--':
        train_args = train_args[1:]

    base = [sys.executable, str(Path(__file__).parent / 'train.py')] + train_args
    for attempt in range(args.max_restarts + 1):
        cmd = list(base)
        if attempt > 0 and '--resume' not in cmd:
            cmd += ['--resume', 'auto']
        print(f'[resilient] attempt {attempt}: {" ".join(cmd)}', flush=True)
        rc = subprocess.call(cmd)
        if rc == 0:
            print('[resilient] finished cleanly', flush=True)
            return 0
        print(f'[resilient] exited rc={rc}; relaunching after cooldown',
              flush=True)
        time.sleep(args.cooldown)
    print('[resilient] giving up after max restarts', flush=True)
    return 1


if __name__ == '__main__':
    sys.exit(main())
