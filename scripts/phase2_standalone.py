#!/usr/bin/env python3
"""Standalone Phase-2 self-supervised campaign on a trained checkpoint.

The in-loop Phase-2 sub-epoch is gated on TF exact >= 0.80
(training/train_loop.py; reference: train_v12_clean.py:1024-1049) — on an
order-resampled corpus that gate measures fresh-respelling accuracy and
may stay closed even when the model is strong on its source corpus.  This
driver runs the SAME SelfSupervisedEpoch machinery
(training/self_supervised.py; reference: training/self_supervised.py:1299)
directly against a checkpoint: build the z-cache, run N gated low-LR
sub-epochs, track novel discoveries, and save the updated params as a new
loadable checkpoint (optional).

Usage:
    python scripts/phase2_standalone.py \
        --checkpoint results/run5/ckpt_snapshot \
        --csv data/processed/jarvis_merged_v2.csv.gz \
        --sub-epochs 3 --out-dir results/run5/phase2
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--csv', default='data/processed/jarvis_merged_v2.csv.gz')
    p.add_argument('--limit', type=int, default=None,
                   help='head-slice the corpus (smoke tests)')
    p.add_argument('--sub-epochs', type=int, default=3)
    p.add_argument('--n-samples', type=int, default=256,
                   help='z samples per sub-epoch')
    p.add_argument('--phase2-weight', type=float, default=0.1)
    p.add_argument('--lr-factor', type=float, default=0.1)
    p.add_argument('--base-lr', type=float, default=3e-5)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--out-dir', default='results/phase2')
    p.add_argument('--save-checkpoint', default=None,
                   help='write the post-Phase-2 params as a loadable '
                        'checkpoint here')
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from superconductor_vae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    from superconductor_vae_tpu.checkpoint import (ckpt_skew_transform,
                                                   load_checkpoint)
    from superconductor_vae_tpu.data import load_dataset
    from superconductor_vae_tpu.generation.latent_analyzer import (
        LatentSpaceAnalyzer,
    )
    from superconductor_vae_tpu.models import (FormulaDecoder,
                                               MaterialsEncoder)
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.tokenizer import default_tokenizer
    from superconductor_vae_tpu.training.self_supervised import (
        Phase2Config, SelfSupervisedEpoch,
    )
    from superconductor_vae_tpu.training.train_step import build_luts

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    restored, meta = load_checkpoint(args.checkpoint)
    mcfg = ModelConfig(**meta['model_config'])
    tokenizer = default_tokenizer(max_len=mcfg.max_len)
    ds = load_dataset(args.csv, max_len=mcfg.max_len, tokenizer=tokenizer,
                      limit=args.limit,
                      skew_transform=ckpt_skew_transform(meta))
    encoder = MaterialsEncoder(mcfg)
    decoder = FormulaDecoder(mcfg)
    luts = build_luts(tokenizer)

    phase2 = SelfSupervisedEpoch(
        encoder, decoder, tokenizer, ds, luts,
        cfg=Phase2Config(n_samples=args.n_samples,
                         lr_factor=args.lr_factor),
        base_lr=args.base_lr, output_dir=str(out_dir))

    enc_params = restored['enc_params']
    dec_params = restored['dec_params']
    rng = jax.random.PRNGKey(args.seed)
    log_path = out_dir / 'phase2_log.jsonl'
    current_exact = float((meta.get('controllers') or {})
                          .get('last_ar_exact', 0.0)) or None

    print(f'z-cache over {len(ds)} rows ...', flush=True)
    cache = LatentSpaceAnalyzer(encoder, enc_params).build_cache(ds)

    for se in range(args.sub_epochs):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        out = phase2.run(enc_params, dec_params, cache.z, sub,
                         phase2_weight=args.phase2_weight,
                         current_exact=current_exact)
        enc_params = out['enc_params']
        dec_params = out['dec_params']
        rec = {'sub_epoch': se, 'wall_s': round(time.perf_counter() - t0, 2),
               'metrics': out['metrics']}
        with open(log_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')
        print(f'[phase2 {se}] {out["metrics"]}', flush=True)
        # refresh the z-cache after an update so later sub-epochs sample
        # the CURRENT latent geometry (in-loop behavior rebuilds per fire)
        if se + 1 < args.sub_epochs:
            cache = LatentSpaceAnalyzer(encoder, enc_params).build_cache(ds)

    tracker = phase2.tracker
    summary = {
        'checkpoint': str(args.checkpoint),
        'sub_epochs': args.sub_epochs,
        'n_samples': args.n_samples,
        'novel_discoveries': len(tracker.discoveries),
        'unique_novel': len({d['formula'] for d in tracker.discoveries}),
        'holdout_hits': list(tracker.holdout_hits),
        'log': str(log_path),
    }
    (out_dir / 'phase2_summary.json').write_text(
        json.dumps(summary, indent=2, default=str))
    print(json.dumps(summary, indent=2, default=str))

    if args.save_checkpoint:
        # params-only loadable checkpoint (same layout as
        # scripts/snapshot_params.py): updated params + the source meta
        import jax as _jax
        import orbax.checkpoint as ocp
        dst = Path(args.save_checkpoint).resolve()
        dst.mkdir(parents=True, exist_ok=True)
        payload = {k: v for k, v in restored.items()
                   if not k.endswith('_opt')}
        payload['enc_params'] = enc_params
        payload['dec_params'] = dec_params
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(dst / 'state', _jax.device_get(payload), force=True)
        meta2 = dict(meta)
        meta2['phase2'] = summary
        (dst / 'meta.json').write_text(
            json.dumps(meta2, indent=2, default=str))
        print(f'saved post-Phase-2 checkpoint -> {dst}')


if __name__ == '__main__':
    main()
