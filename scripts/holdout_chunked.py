#!/usr/bin/env python3
"""Chunked holdout-campaign driver (OOM-resilient).

A single long `scripts/holdout_search.py` process leaks host memory across
targets (~10+ GB/target with constrained decode at budget 8000; the kernel
OOM-kills it after ~5-9 targets — observed 2026-08-18, anon-rss 127 GB).
Until the leak is fixed at the source, this wrapper runs the campaign as a
sequence of short-lived subprocesses, each covering a small chunk of
targets, so an OOM kill costs at most the in-flight target:

  * before each chunk it re-reads the stream JSONL and picks the first
    missing target index, so killed/partial chunks self-heal;
  * each subprocess appends finished targets to the same stream
    (kill-safe, like the reference's per-target result records in
    scripts/holdout/holdout_search.py).

Usage:
    python scripts/holdout_chunked.py --checkpoint <ckpt> \
        --stream results/runX/holdout_stream.jsonl --chunk 5 [-- ...]

Extra args after `--` are forwarded to holdout_search.py verbatim.
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def done_indices(stream: Path) -> set:
    idx = set()
    if stream.exists():
        for line in stream.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                idx.add(int(json.loads(line)['index']))
            except (ValueError, KeyError):
                continue
    return idx


def next_chunk(done: set, n_total: int, chunk: int):
    """First contiguous run of missing target indices, capped at ``chunk``.

    Returns ``(offset, n)`` or ``None`` when the campaign is complete."""
    missing = [i for i in range(n_total) if i not in done]
    if not missing:
        return None
    lo = missing[0]
    n = 1
    while n < chunk and lo + n < n_total and lo + n not in done:
        n += 1
    return lo, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--stream', required=True)
    p.add_argument('--n-total', type=int, default=45,
                   help='total holdout targets')
    p.add_argument('--chunk', type=int, default=5,
                   help='targets per subprocess (keep below the OOM horizon)')
    p.add_argument('--max-retries', type=int, default=3,
                   help='abort if a chunk makes no stream progress this many '
                        'times in a row')
    args, fwd = p.parse_known_args()
    if fwd and fwd[0] == '--':
        fwd = fwd[1:]

    stream = Path(args.stream)
    stalls = 0
    while True:
        done = done_indices(stream)
        nxt = next_chunk(done, args.n_total, args.chunk)
        if nxt is None:
            print(f'[chunked] campaign complete: {args.n_total} targets')
            break
        lo, n = nxt
        print(f'[chunked] {len(done)}/{args.n_total} done; '
              f'launching offset={lo} n={n}', flush=True)
        cmd = [sys.executable, '-u', str(REPO / 'scripts/holdout_search.py'),
               '--checkpoint', args.checkpoint,
               '--target-offset', str(lo), '--n-targets', str(n),
               '--stream', str(stream),
               '--out', str(stream.parent / f'holdout_chunk{lo}.json'),
               *fwd]
        rc = subprocess.call(cmd, cwd=REPO)
        after = done_indices(stream)
        if len(after) == len(done):
            stalls += 1
            print(f'[chunked] chunk rc={rc} made no progress '
                  f'({stalls}/{args.max_retries})', flush=True)
            if stalls >= args.max_retries:
                print('[chunked] aborting: repeated no-progress chunks')
                return 1
        else:
            stalls = 0
    return 0


if __name__ == '__main__':
    sys.exit(main())
