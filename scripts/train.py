#!/usr/bin/env python3
"""Training CLI for the TPU-native superconductor generator.

Equivalent entry point to the reference's ``scripts/train_v12_clean.py``
(reference: :5926 ``train()``), driving the jitted DP train step.

Usage:
    python scripts/train.py                      # full run on shipped dataset
    python scripts/train.py --epochs 5 --limit 256 --cpu   # quick smoke
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_CSV = '/root/reference/data/processed/new_sc_datasets.csv'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--csv', default=DEFAULT_CSV)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--limit', type=int, default=None,
                   help='cap dataset rows (smoke tests)')
    p.add_argument('--output', default='outputs')
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--cpu', action='store_true', help='force CPU backend')
    p.add_argument('--synthetic', action='store_true',
                   help='use the synthetic dataset instead of a CSV')
    p.add_argument('--tiny', action='store_true',
                   help='tiny model config (CI/smoke)')
    p.add_argument('--rl-weight', type=float, default=None)
    p.add_argument('--bf16', action='store_true',
                   help='bfloat16 compute (fp32 params + losses); ~2x MXU '
                        'throughput on TPU')
    p.add_argument('--resume', default=None,
                   help="'auto' or a checkpoint path")
    p.add_argument('--checkpoint-interval', type=int, default=None)
    p.add_argument('--set', action='append', default=[],
                   metavar='KEY=VALUE',
                   help='override any TrainConfig field, e.g. '
                        '--set rl_reactivation_min_exact=0.85')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from superconductor_vae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superconductor_vae_tpu.training import TrainConfig, train
    from superconductor_vae_tpu.models.config import ModelConfig, tiny_test_config

    tcfg = TrainConfig()
    if args.epochs is not None:
        tcfg.num_epochs = args.epochs
    if args.batch_size is not None:
        tcfg.batch_size = args.batch_size
    if args.lr is not None:
        tcfg.learning_rate = args.lr
    if args.rl_weight is not None:
        tcfg.rl_weight = args.rl_weight
    if args.bf16:
        tcfg.compute_dtype = 'bfloat16'
    if args.resume is not None:
        tcfg.resume = args.resume
    if args.checkpoint_interval is not None:
        tcfg.checkpoint_interval = args.checkpoint_interval
    for kv in args.set:
        key, _, raw = kv.partition('=')
        if not hasattr(tcfg, key):
            p.error(f'unknown TrainConfig field: {key}')
        cur = getattr(tcfg, key)
        val = (raw if isinstance(cur, str)
               else raw.lower() in ('1', 'true', 'yes') if isinstance(cur, bool)
               else type(cur)(raw) if cur is not None else float(raw))
        setattr(tcfg, key, val)

    mcfg = tiny_test_config() if args.tiny else None
    if args.tiny:
        tcfg.max_formula_len = mcfg.max_len
        tcfg.use_physics_z = False

    out = train(
        csv_path=None if args.synthetic else args.csv,
        model_config=mcfg,
        train_config=tcfg,
        output_dir=args.output,
        limit=args.limit,
    )
    final = out['history'][-1]
    print(f"done: exact={final['exact_match']:.3f} "
          f"true_ar={final['true_ar_exact']:.3f} "
          f"throughput={final['samples_per_s']}/s")


if __name__ == '__main__':
    main()
