#!/usr/bin/env python3
"""Holdout generative search CLI.

Equivalent of the reference's scripts/holdout/holdout_search_targeted.py:778.

Usage:
    python scripts/holdout_search.py --checkpoint outputs/checkpoints/best \
        --csv /root/reference/data/processed/new_sc_datasets.csv --budget 200
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
                   default='/root/reference/data/processed/new_sc_datasets.csv')
    p.add_argument('--budget', type=int, default=200)
    p.add_argument('--refine-rounds', type=int, default=2,
                   help='zoom-in sweeps around the best candidate')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--n-targets', type=int, default=None)
    p.add_argument('--target-offset', type=int, default=0,
                   help='start at this absolute holdout index (shard long '
                        'campaigns across subprocesses; rng folds stay '
                        'aligned with the unsharded run)')
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--no-guided', action='store_true',
                   help='disable head-guided latent optimization')
    p.add_argument('--no-inverse', action='store_true',
                   help='disable local inverse-regression queries')
    p.add_argument('--no-inversion', action='store_true',
                   help='disable direct decoder inversion (TF-CE gradient '
                        'descent on z toward the exact target sequence)')
    p.add_argument('--inversion-starts', type=int, default=24)
    p.add_argument('--inversion-steps', type=int, default=384)
    p.add_argument('--guided-starts', type=int, default=16)
    p.add_argument('--constrain-elements', action='store_true',
                   help='restrict decode to the target element set '
                        '(extended capability mode; NOT comparable to the '
                        'reference holdout protocol)')
    p.add_argument('--decode-chunk', type=int, default=2048,
                   help='fixed decode batch (bounds KV-cache memory)')
    p.add_argument('--sample-slice', type=int, default=4096,
                   help='leading pool rows decoded at sampled temperatures')
    p.add_argument('--sample-draws', type=int, default=2)
    p.add_argument('--skew-transform', default=None,
                   choices=['rank_gauss', 'quantile'],
                   help='override the corpus Magpie skew transform '
                        '(default: what the checkpoint trained under). '
                        'quantile on a rank-gauss checkpoint isolates the '
                        'invertible-normalization effect on oracle '
                        'reconstruction: corpus rows shift only at tied '
                        'blocks, while fresh formulas gain REAL skewed-'
                        'column features instead of the column mean')
    p.add_argument('--no-snap-stoich', action='store_true',
                   help='disable the rational snap of predicted stoich '
                        'conditioning before decode (round-5 default ON; '
                        'generation/stoich_snap.py)')
    p.add_argument('--no-oracle', action='store_true',
                   help='skip the per-target oracle-reconstruction '
                        'diagnostic (the standalone --oracle-only run '
                        'already publishes it; in-campaign it costs ~30% '
                        'of a target wall: 144s/490s profiled)')
    p.add_argument('--oracle-only', action='store_true',
                   help='skip the generative search entirely: encode each '
                        'holdout composition directly (alphabetical slots, '
                        'full Magpie via the persisted quantile transform '
                        'when the checkpoint trained with one, known Tc) '
                        'and greedy-decode — the holdout RECONSTRUCTION '
                        'number (oracle_match/45), fast')
    p.add_argument('--strategy-order', default='tiered',
                   choices=['tiered', 'inversion_first'],
                   help="'tiered' runs navigation -> guided -> inversion "
                        'so exact matches are attributed to the weakest '
                        'information budget that lands them (the honest '
                        "reporting protocol); 'inversion_first' is the "
                        'legacy speed ordering')
    p.add_argument('--out', default='outputs/holdout_results.json')
    p.add_argument('--stream', default=None,
                   help='append each finished target to this JSONL as it '
                        'completes (survives a mid-campaign kill)')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    # per-target rerun subprocesses (holdout_rerun_misses.py) share the
    # decode executables across processes via the on-disk cache
    from superconductor_vae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache(min_compile_secs=0.05)

    import jax.numpy as jnp
    from superconductor_vae_tpu.checkpoint import load_checkpoint
    from superconductor_vae_tpu.data import load_dataset
    from superconductor_vae_tpu.generation import SuperconductorDiscoveryPipeline
    from superconductor_vae_tpu.generation.holdout_search import HoldoutSearch
    from superconductor_vae_tpu.models import MaterialsEncoder, FormulaDecoder
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.tokenizer import default_tokenizer

    from superconductor_vae_tpu.checkpoint import ckpt_skew_transform
    restored, meta = load_checkpoint(args.checkpoint)
    mcfg = ModelConfig(**meta['model_config'])
    tokenizer = default_tokenizer(max_len=mcfg.max_len)
    ds = load_dataset(args.csv, max_len=mcfg.max_len, tokenizer=tokenizer,
                      skew_transform=(args.skew_transform
                                      or ckpt_skew_transform(meta)))

    encoder = MaterialsEncoder(mcfg)
    decoder = FormulaDecoder(mcfg)
    pipe = SuperconductorDiscoveryPipeline(
        encoder, decoder, restored['enc_params'], restored['dec_params'],
        tokenizer, ds, type_masks=jnp.asarray(tokenizer.type_masks))
    search = HoldoutSearch(pipe)
    lo = args.target_offset
    hi = lo + args.n_targets if args.n_targets else len(search.targets)
    targets = search.targets[lo:hi] if (lo, hi) != (0, len(search.targets)) \
        else None
    stream_fn = None
    if args.stream:
        import dataclasses
        stream_path = Path(args.stream)
        stream_path.parent.mkdir(parents=True, exist_ok=True)

        def stream_fn(idx, result):
            with stream_path.open('a') as fh:
                fh.write(json.dumps(
                    {'index': idx, 'seed': args.seed, 'budget': args.budget,
                     'strategy_order': args.strategy_order,
                     **dataclasses.asdict(result)}) + '\n')

    if args.oracle_only:
        from superconductor_vae_tpu.data.pipeline import (
            canonical_composition_key,
        )
        rows = []
        for t in (targets or search.targets):
            # same mask convention as the in-campaign oracle diagnostic
            # (element-constrained; within the oracle's information budget,
            # which already includes the full target composition) so the two
            # oracle numbers measure the same protocol
            res = search.oracle_reconstruct(
                t, type_masks=search._element_type_masks(t))
            rec = {'target': t, 'oracle_formula': None,
                   'oracle_match': False,
                   'oracle_masks': 'element-constrained'}
            if res is not None:
                f0 = res[0]
                tkey = canonical_composition_key(t)
                rec['oracle_formula'] = f0
                rec['oracle_match'] = bool(
                    tkey is not None and f0
                    and canonical_composition_key(f0) == tkey)
            rows.append(rec)
            print(f"{t}: {rec['oracle_formula']!r} "
                  f"{'MATCH' if rec['oracle_match'] else ''}", flush=True)
        summary = {'n_targets': len(rows),
                   'oracle_match': sum(r['oracle_match'] for r in rows),
                   'skew_transform': (args.skew_transform
                                      or ckpt_skew_transform(meta))}
        print(json.dumps(summary, indent=2))
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(
            {'summary': summary, 'results': rows}, indent=2))
        return

    results = search.search(budget_per_target=args.budget, targets=targets,
                            target_offset=lo, stream_fn=stream_fn,
                            refine_rounds=args.refine_rounds,
                            guided=not args.no_guided,
                            guided_starts=args.guided_starts,
                            inversion=not args.no_inversion,
                            inversion_starts=args.inversion_starts,
                            inversion_steps=args.inversion_steps,
                            inverse_regression=not args.no_inverse,
                            constrain_elements=args.constrain_elements,
                            decode_chunk=args.decode_chunk,
                            sample_slice=args.sample_slice,
                            sample_draws=args.sample_draws,
                            strategy_order=args.strategy_order,
                            snap_stoich=not args.no_snap_stoich,
                            oracle_diagnostic=not args.no_oracle,
                            seed=args.seed)
    summary = HoldoutSearch.summarize(results)
    print(json.dumps(summary, indent=2))

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps({
        'summary': summary,
        'results': [r.__dict__ for r in results],
    }, indent=2))


if __name__ == '__main__':
    main()
