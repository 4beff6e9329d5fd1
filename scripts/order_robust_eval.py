#!/usr/bin/env python3
"""Order-robust AR evaluation: does the model treat respelled formulas as
the same material?

For a seeded (stratified) sample of corpus rows, generate K random
element-order respellings per row (the same machinery training augments
with: data/pipeline.py::_apply_order_augmentation, reference rationale
data/canonical_ordering.py:228-295), encode+greedy-decode each respelling,
and report:

- respelled_ar_exact: decoded stream == the respelling's own target tokens
  (what training literally optimizes on augmented rows; ceiling < 1 because
  one z can only decode to one spelling)
- composition_exact:  decoded formula has the SOURCE row's composition
  (order-robust semantic accuracy — the headline number)
- canonical_output_rate: decoded string == the source corpus spelling
  (the model normalizes element order back to corpus order)
- z_consistency: mean cosine similarity between the source row's z and each
  respelling's z (encoder order-invariance)

Usage:
    python scripts/order_robust_eval.py --checkpoint results/run5/ckpt_snapshot \
        --csv data/processed/jarvis_merged_v2.csv.gz --limit 1024 --k 2
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
    p.add_argument('--limit', type=int, default=1024)
    p.add_argument('--k', type=int, default=2,
                   help='respellings per row (max; single-element rows '
                        'have only one spelling)')
    p.add_argument('--sample-seed', type=int, default=0)
    p.add_argument('--respell-seed', type=int, default=12345)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--out', default=None)
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from superconductor_vae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from superconductor_vae_tpu.checkpoint import (
        ckpt_skew_transform, load_checkpoint,
    )
    from superconductor_vae_tpu.data import load_dataset
    from superconductor_vae_tpu.data.pipeline import (
        _apply_order_augmentation, canonical_composition_key,
    )
    from superconductor_vae_tpu.models import (
        FormulaDecoder, MaterialsEncoder,
    )
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.tokenizer import default_tokenizer
    from superconductor_vae_tpu.training import TrainConfig
    from superconductor_vae_tpu.training.evaluate import (
        evaluate_autoregressive,
    )
    from superconductor_vae_tpu.training.train_step import build_luts

    restored, meta = load_checkpoint(args.checkpoint)
    mcfg = ModelConfig(**meta['model_config'])
    tokenizer = default_tokenizer(max_len=mcfg.max_len)
    ds = load_dataset(args.csv, max_len=mcfg.max_len, tokenizer=tokenizer,
                      skew_transform=ckpt_skew_transform(meta))
    idx = ds.sample_indices(args.limit, seed=args.sample_seed,
                            stratify_sc=True)
    base = ds.subset(idx)

    aug = _apply_order_augmentation(base, tokenizer, args.k,
                                    args.respell_seed)
    n0, n_all = len(base), len(aug)
    if n_all == n0:
        print(json.dumps({'error': 'no multi-element rows to respell'}))
        return
    resp_rows = np.arange(n0, n_all)
    src_of = aug.aug_group[resp_rows]          # source row per respelling

    tcfg = TrainConfig(max_formula_len=mcfg.max_len)
    for k, v in (meta.get('eval_gating') or {}).items():
        setattr(tcfg, k, v)
    luts = build_luts(tokenizer)
    encoder = MaterialsEncoder(mcfg)
    decoder = FormulaDecoder(mcfg)

    t0 = time.perf_counter()
    out = evaluate_autoregressive(
        encoder, decoder, restored['enc_params'], restored['dec_params'],
        aug, tcfg, luts, tokenizer=tokenizer, batch_size=args.batch_size,
        collect_errors=True, sample_indices=resp_rows)

    # baseline AR on the source rows themselves (same slice, same gating)
    out_src = evaluate_autoregressive(
        encoder, decoder, restored['enc_params'], restored['dec_params'],
        aug, tcfg, luts, tokenizer=tokenizer, batch_size=args.batch_size,
        collect_errors=True, sample_indices=np.arange(n0))

    comp_of = canonical_composition_key   # spelling-independent identity

    def decoded_map(res):
        return {int(r['index']): r['generated']
                for r in res['error_records']}

    dec_resp = decoded_map(out)
    dec_src = decoded_map(out_src)
    ar = out['per_sample_ar_exact']

    comp_exact = np.zeros(len(resp_rows), bool)
    canonical = np.zeros(len(resp_rows), bool)
    for j, row in enumerate(resp_rows):
        src = int(src_of[j])
        src_comp = comp_of(base.formulas[src])
        src_decoded_target = tokenizer.decode(
            np.asarray(base.tokens[src][1:]))
        if ar[j]:
            decoded = aug.formulas[row]        # exact == its own spelling
        else:
            decoded = dec_resp.get(int(row), '')
        comp_exact[j] = (src_comp is not None and decoded != ''
                         and comp_of(decoded) == src_comp)
        canonical[j] = (decoded == base.formulas[src]
                        or decoded == src_decoded_target)

    # source-row composition accuracy for reference
    src_ar = out_src['per_sample_ar_exact']
    src_comp_exact = np.zeros(n0, bool)
    for i in range(n0):
        if src_ar[i]:
            src_comp_exact[i] = True
        else:
            d = dec_src.get(i, '')
            src_comp_exact[i] = comp_of(d) == comp_of(base.formulas[i])

    # encoder order-invariance: cosine(z_src, z_respelled)
    import jax
    import jax.numpy as jnp

    @jax.jit
    def z_of(enc_params, batch):
        enc_out = encoder.apply(
            enc_params, batch['element_indices'], batch['element_fractions'],
            batch['element_mask'], batch['magpie'], batch['tc'])
        return enc_out['z']

    cos = []
    bs = args.batch_size
    for s in range(0, len(resp_rows), bs):
        rows = resp_rows[s:s + bs]
        pad = bs - len(rows)
        rows_p = np.concatenate([rows, rows[:1].repeat(pad)]) if pad else rows
        srcs_p = aug.aug_group[rows_p]
        zb = np.asarray(z_of(restored['enc_params'],
                             {k: jnp.asarray(v) for k, v in
                              aug.batch(rows_p).items()}))
        zs = np.asarray(z_of(restored['enc_params'],
                             {k: jnp.asarray(v) for k, v in
                              aug.batch(srcs_p).items()}))
        c = (zb * zs).sum(1) / np.maximum(
            np.linalg.norm(zb, axis=1) * np.linalg.norm(zs, axis=1), 1e-9)
        cos.append(c[:len(rows)])
    cos = np.concatenate(cos)

    summary = {
        'checkpoint': str(args.checkpoint),
        'epoch': meta.get('epoch'),
        'slice': {'sample': 'stratified', 'seed': args.sample_seed,
                  'limit': args.limit, 'k': args.k,
                  'respell_seed': args.respell_seed},
        'n_source_rows': int(n0),
        'n_respellings': int(len(resp_rows)),
        'source_ar_exact': float(src_ar.mean()),
        'source_composition_exact': float(src_comp_exact.mean()),
        'respelled_ar_exact': float(ar.mean()),
        'composition_exact': float(comp_exact.mean()),
        'canonical_output_rate': float(canonical.mean()),
        'z_cosine_mean': float(cos.mean()),
        'z_cosine_p5': float(np.percentile(cos, 5)),
        'wall_s': round(time.perf_counter() - t0, 2),
    }
    print(json.dumps(summary, indent=2))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
