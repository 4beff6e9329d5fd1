#!/usr/bin/env python3
"""Standalone checkpoint evaluation CLI.

True-AR exact match + TF metrics for a trained checkpoint over a corpus
(the reference embeds this in evaluate_true_autoregressive inside the
train script, train_v12_clean.py:4431; here it is a first-class tool).

Usage:
    python scripts/evaluate.py --checkpoint outputs/run2/checkpoints/best \
        --csv data/processed/jarvis_merged.csv.gz
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--csv',
                   default='data/processed/jarvis_merged.csv.gz')
    p.add_argument('--limit', type=int, default=None)
    p.add_argument('--sample', choices=['head', 'random', 'stratified'],
                   default='stratified',
                   help='how --limit selects rows: seeded random, '
                        'is_sc-stratified 50/50 (default), or the legacy '
                        'CSV head slice')
    p.add_argument('--sample-seed', type=int, default=0)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--max-batches', type=int, default=None,
                   help='default: the whole corpus')
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--errors-out', default=None,
                   help='write per-sample error records JSONL here')
    p.add_argument('--out', default=None, help='write summary JSON here')
    p.add_argument('--speculative', action='store_true',
                   help='decode with the n-gram-draft speculative verifier '
                        '(pure greedy, no decode gates) instead of the '
                        'gated KV-cache scan — the end-to-end A/B for '
                        'docs/RESULTS.md')
    p.add_argument('--pallas-decode', action='store_true',
                   help='run the AR decode with the fused Pallas '
                        'cache-update+attention kernel inside the scan '
                        '(ModelConfig.pallas_decode) — end-to-end A/B vs '
                        'the XLA path')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from superconductor_vae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from superconductor_vae_tpu.checkpoint import load_checkpoint
    from superconductor_vae_tpu.data import load_dataset
    from superconductor_vae_tpu.models import MaterialsEncoder, FormulaDecoder
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.tokenizer import default_tokenizer
    from superconductor_vae_tpu.training import TrainConfig
    from superconductor_vae_tpu.training.evaluate import (
        evaluate_autoregressive,
    )
    from superconductor_vae_tpu.training.train_step import build_luts

    from superconductor_vae_tpu.checkpoint import ckpt_skew_transform
    restored, meta = load_checkpoint(args.checkpoint)
    mcfg = ModelConfig(**meta['model_config'])
    tokenizer = default_tokenizer(max_len=mcfg.max_len)
    head_limit = args.limit if args.sample == 'head' else None
    ds = load_dataset(args.csv, max_len=mcfg.max_len, tokenizer=tokenizer,
                      limit=head_limit,
                      skew_transform=ckpt_skew_transform(meta))
    slice_provenance = {'sample': 'full', 'seed': None}
    if args.limit is not None and args.sample != 'head':
        # round-4 change of default: --limit takes a seeded stratified
        # sample, NOT the legacy head slice — say so loudly so limited-eval
        # numbers aren't silently compared against pre-round-4 head-slice
        # JSONs (ADVICE r4; pass --sample head for the legacy behavior)
        print(f'# note: --limit {args.limit} uses {args.sample!r} sampling '
              f'(seed {args.sample_seed}), not the legacy head slice',
              file=sys.stderr)
        idx = ds.sample_indices(args.limit, seed=args.sample_seed,
                                stratify_sc=(args.sample == 'stratified'))
        ds = ds.subset(idx)
        slice_provenance = {'sample': args.sample, 'seed': args.sample_seed}
    elif args.limit is not None:
        slice_provenance = {'sample': 'head', 'seed': None}
    tcfg = TrainConfig(max_formula_len=mcfg.max_len)
    # reproduce the training run's decode gating (stop boost, type masking,
    # ...) rather than silently using defaults
    for k, v in (meta.get('eval_gating') or {}).items():
        setattr(tcfg, k, v)
    luts = build_luts(tokenizer)

    if args.pallas_decode:
        import dataclasses
        mcfg = dataclasses.replace(mcfg, pallas_decode=True)
    encoder = MaterialsEncoder(mcfg)
    decoder = FormulaDecoder(mcfg)

    spec_tables = None
    if args.speculative:
        import jax.numpy as jnp
        from superconductor_vae_tpu.models.draft import build_ngram_draft
        from superconductor_vae_tpu.tokenizer import BOS_ID
        stream = np.concatenate(
            [np.full((len(ds), 1), BOS_ID, np.int64),
             ds.tokens.astype(np.int64)[:, 1:]], axis=1)
        d = build_ngram_draft(stream, tokenizer)
        spec_tables = {'bigram': jnp.asarray(d['bigram']),
                       'trigram': jnp.asarray(d['trigram'])}

    import time
    t0 = time.perf_counter()
    out = evaluate_autoregressive(
        encoder, decoder, restored['enc_params'], restored['dec_params'],
        ds, tcfg, luts, tokenizer=tokenizer, batch_size=args.batch_size,
        max_batches=args.max_batches,
        collect_errors=args.errors_out is not None,
        speculative_tables=spec_tables)
    wall_s = time.perf_counter() - t0

    summary = {
        'checkpoint': str(args.checkpoint),
        'epoch': meta.get('epoch'),
        'decode_path': ('speculative' if args.speculative
                        else 'pallas' if args.pallas_decode else 'xla'),
        'slice': dict(slice_provenance, limit=args.limit),
        'eval_wall_s': round(wall_s, 2),
        'formulas_per_s': round(out['n_evaluated'] / max(wall_s, 1e-9), 1),
        'n_evaluated': int(out['n_evaluated']),
        'true_ar_exact': float(out['ar_exact']),
        'tf_exact': float(out['tf_exact']),
        'tc_mae_kelvin': float(out['tc_mae_kelvin']),
        'tc_r2_per_bin': out['tc_r2_per_bin'],
        'sc_metrics': out.get('sc_metrics', {}),
        'family_coarse_acc': float(out['family_coarse_acc']),
        'z_norm_mean': float(out['z_norm_mean']),
    }
    print(json.dumps(summary, indent=2))
    if args.errors_out:
        Path(args.errors_out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.errors_out, 'w') as f:
            for rec in out.get('error_records', []):
                f.write(json.dumps(rec) + '\n')
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
