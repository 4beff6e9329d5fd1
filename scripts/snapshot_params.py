#!/usr/bin/env python3
"""Git-durable params snapshot of an Orbax checkpoint.

The sandbox VM restores from the last git commit on restart: every
untracked artifact — including ``outputs/`` checkpoints — is wiped (this
destroyed run2's epoch-775 weights between sessions). This script
extracts the inference payload (params + step, no optimizer moments),
downcasts float32 leaves to bfloat16 (the training compute dtype, so
eval / holdout behavior is unchanged), and re-saves it as a normal
loadable checkpoint inside a git-tracked directory: ~210MB for the 108M
model vs ~1.3GB for the full-state checkpoint.

The snapshot loads anywhere a full checkpoint does (scripts/evaluate.py,
scripts/holdout_search.py, ``--resume``); resuming training from it
warm-restarts the optimizer, which the resume path already tolerates.

Usage:
    python scripts/snapshot_params.py \
        --checkpoint outputs/run3/checkpoints/best \
        --out results/run3/ckpt_snapshot
"""

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

# snapshotting is pure host IO — keep it off the (busy) TPU. The env var
# alone is not honored on the axon tunnel (tests/conftest.py:14-23), so
# also force it via jax.config before any backend use.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--keep-fp32', action='store_true',
                   help='skip the bf16 downcast (2x the size)')
    args = p.parse_args()

    import numpy as np
    import ml_dtypes
    import orbax.checkpoint as ocp

    src = Path(args.checkpoint).resolve()
    out = Path(args.out).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(src / 'state')

    payload = {k: v for k, v in restored.items() if not k.endswith('_opt')}

    def cast(leaf):
        arr = np.asarray(leaf)
        if not args.keep_fp32 and arr.dtype == np.float32:
            return arr.astype(ml_dtypes.bfloat16)
        return arr

    import jax
    payload = jax.tree.map(cast, payload)

    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(out / 'state', payload, force=True)
    meta = json.loads((src / 'meta.json').read_text())
    meta['snapshot'] = {'source': str(src), 'params_dtype':
                        'float32' if args.keep_fp32 else 'bfloat16'}
    (out / 'meta.json').write_text(json.dumps(meta, indent=2, default=str))
    n = sum(np.asarray(v).nbytes for v in jax.tree.leaves(payload))
    print(f'snapshot: {src} -> {out} ({n/1e6:.0f} MB)')


if __name__ == '__main__':
    main()
