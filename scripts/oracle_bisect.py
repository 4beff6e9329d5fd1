#!/usr/bin/env python3
"""Oracle-reconstruction bisect (VERDICT r4 item 3 root-cause protocol).

Pushes N random *training* formulas through the SAME fresh-formula oracle
path used for holdout targets (HoldoutSearch.oracle_encode_latent:
re-parse -> alphabetical slots -> normalized fractions -> fresh-Magpie
through the persisted quantile grids -> known Tc -> encode -> greedy
decode) and reports how many reconstruct exactly (composition-level).

Interpretation: if training rows reconstruct at ~AR-exact rates through
this path, the oracle mechanism is sound and a 0/45 holdout number is the
train->holdout generalization gap (the reference documents the same gap:
86.5% train vs 22.2% holdout exact, self_supervised.py:4-6), not a
normalization/plumbing defect.

Usage:
    python scripts/oracle_bisect.py --checkpoint results/run5/ckpt_snapshot \
        --csv data/processed/jarvis_merged_v2.csv.gz --n 128 [--cpu]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--csv', default='data/processed/jarvis_merged_v2.csv.gz')
    p.add_argument('--n', type=int, default=128)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--out', default=None)
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from superconductor_vae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np
    from superconductor_vae_tpu.checkpoint import (
        ckpt_skew_transform, load_checkpoint,
    )
    from superconductor_vae_tpu.data import load_dataset
    from superconductor_vae_tpu.data.pipeline import canonical_composition_key
    from superconductor_vae_tpu.generation import (
        SuperconductorDiscoveryPipeline,
    )
    from superconductor_vae_tpu.generation.holdout_search import HoldoutSearch
    from superconductor_vae_tpu.models import (
        FormulaDecoder, MaterialsEncoder,
    )
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.tokenizer import default_tokenizer

    restored, meta = load_checkpoint(args.checkpoint)
    mcfg = ModelConfig(**meta['model_config'])
    tokenizer = default_tokenizer(max_len=mcfg.max_len)
    ds = load_dataset(args.csv, max_len=mcfg.max_len, tokenizer=tokenizer,
                      skew_transform=ckpt_skew_transform(meta))
    pipe = SuperconductorDiscoveryPipeline(
        MaterialsEncoder(mcfg), FormulaDecoder(mcfg),
        restored['enc_params'], restored['dec_params'], tokenizer, ds,
        type_masks=jnp.asarray(tokenizer.type_masks))
    search = HoldoutSearch(pipe)

    rng = np.random.default_rng(args.seed)
    sel = rng.choice(len(ds), size=min(args.n, len(ds)), replace=False)
    n_ok = n_enc = 0
    misses = []
    for i in sel:
        f = ds.formulas[int(i)]
        zo = search.oracle_encode_latent(f)
        if zo is None:
            continue
        n_enc += 1
        dec = pipe.decode_latents(zo, temperature=0.0)
        d = dec[0] if dec else ''
        ok = (canonical_composition_key(d) == canonical_composition_key(f))
        n_ok += bool(ok)
        if not ok and len(misses) < 20:
            misses.append({'formula': f, 'decoded': d})
    summary = {
        'checkpoint': str(args.checkpoint),
        'epoch': meta.get('epoch'),
        'n_requested': args.n, 'n_encoded': n_enc,
        'train_oracle_exact': n_ok / max(n_enc, 1),
        'seed': args.seed,
        'sample_misses': misses,
    }
    print(json.dumps(summary, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
