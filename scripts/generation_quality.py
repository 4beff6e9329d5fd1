#!/usr/bin/env python3
"""Generation quality audit: decode the dataset AR and grade the outputs.

Compact equivalent of the reference audit
(reference: scripts/analysis/evaluate_generation_quality.py, 701 LoC):
exact-match and element-similarity distributions, validity rates through
the correctors/validators, error taxonomy (wrong element / wrong subscript
/ too long / too short), and per-family breakdown.

Usage:
    python scripts/generation_quality.py --checkpoint outputs/checkpoints/best
"""

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def classify_error(target: str, generated: str) -> str:
    from superconductor_vae_tpu.data import parse_formula_composition
    if generated == target:
        return 'exact'
    ct = parse_formula_composition(target)
    cg = parse_formula_composition(generated)
    if not cg:
        return 'unparseable'
    if set(cg) != set(ct):
        return 'wrong_elements'
    if generated.startswith(target):
        return 'too_long'
    if target.startswith(generated):
        return 'too_short'
    return 'wrong_subscripts'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--csv',
                   default='/root/reference/data/processed/new_sc_datasets.csv')
    p.add_argument('--limit', type=int, default=None)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--out', default='outputs/generation_quality.json')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np
    from superconductor_vae_tpu.checkpoint import load_checkpoint
    from superconductor_vae_tpu.data import load_dataset
    from superconductor_vae_tpu.models import MaterialsEncoder, FormulaDecoder
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.models.family_classifier import SuperconductorFamily
    from superconductor_vae_tpu.tokenizer import default_tokenizer
    from superconductor_vae_tpu.training import TrainConfig
    from superconductor_vae_tpu.training.evaluate import evaluate_autoregressive
    from superconductor_vae_tpu.training.train_step import build_luts
    from superconductor_vae_tpu.generation.holdout_search import element_similarity
    from superconductor_vae_tpu.validation import CandidateValidator

    restored, meta = load_checkpoint(args.checkpoint)
    mcfg = ModelConfig(**{k: tuple(v) if isinstance(v, list) else v
                          for k, v in meta['model_config'].items()})
    tokenizer = default_tokenizer(max_len=mcfg.max_len)
    from superconductor_vae_tpu.checkpoint import ckpt_skew_transform
    ds = load_dataset(args.csv, max_len=mcfg.max_len, tokenizer=tokenizer,
                      limit=args.limit,
                      skew_transform=ckpt_skew_transform(meta))
    tcfg = TrainConfig()
    luts = build_luts(tokenizer)

    encoder, decoder = MaterialsEncoder(mcfg), FormulaDecoder(mcfg)
    out = evaluate_autoregressive(
        encoder, decoder, restored['enc_params'], restored['dec_params'],
        ds, tcfg, luts, tokenizer=tokenizer, collect_errors=True)

    taxonomy = Counter()
    sims = []
    validator = CandidateValidator()
    n_valid = 0
    for rec in out['error_records']:
        taxonomy[classify_error(rec['formula'], rec['generated'])] += 1
        sims.append(element_similarity(rec['generated'], rec['formula']))
        if validator.validate(rec['generated']).is_valid:
            n_valid += 1
    n_err = max(len(out['error_records']), 1)

    report = {
        'n_evaluated': out['n_evaluated'],
        'ar_exact': out['ar_exact'],
        'tf_exact': out['tf_exact'],
        'tc_mae_kelvin': out['tc_mae_kelvin'],
        'tc_r2_per_bin': out['tc_r2_per_bin'],
        'family_coarse_acc': out['family_coarse_acc'],
        'error_taxonomy': dict(taxonomy),
        'error_mean_similarity': float(np.mean(sims)) if sims else 1.0,
        'error_validity_rate': n_valid / n_err,
    }
    print(json.dumps(report, indent=2))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(
        {**report, 'errors': out['error_records'][:200]}, indent=2))


if __name__ == '__main__':
    main()
