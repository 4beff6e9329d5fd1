#!/usr/bin/env python3
"""Physics-Z coordinate analysis of a trained latent space.

Behavioral equivalent of the reference analyzer
(reference: scripts/analysis/analyze_physics_z.py: encode a sample, then
per-block stats, near-constant coordinate detection, and Tc correlation
per physics block).  Reads the training run's latent cache
(outputs/<run>/latent_cache.npz, written on eval cadence) instead of
re-running the encoder — the cache already holds z + denormalized Tc.

Usage:
    python scripts/analyze_physics_z.py outputs/run3/latent_cache.npz
    python scripts/analyze_physics_z.py --checkpoint outputs/run3/checkpoints/best \
        --csv data/processed/jarvis_merged.csv.gz     # re-encode instead
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _to_f32(a):
    if a.dtype.kind == 'V':     # bfloat16 round-trips through npz as void16
        import ml_dtypes
        a = a.view(ml_dtypes.bfloat16)
    return a.astype(np.float32)


def load_from_cache(path):
    blob = np.load(path)
    return (_to_f32(blob['z']), _to_f32(blob['tc_kelvin']),
            blob['is_sc'].astype(bool), blob['family'])


def load_by_encoding(checkpoint, csv, n_samples, cpu):
    import jax
    if cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from superconductor_vae_tpu.checkpoint import load_checkpoint
    from superconductor_vae_tpu.data import load_dataset
    from superconductor_vae_tpu.models import MaterialsEncoder
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.tokenizer import default_tokenizer

    restored, meta = load_checkpoint(checkpoint)
    mcfg = ModelConfig(**{k: tuple(v) if isinstance(v, list) else v
                          for k, v in meta['model_config'].items()})
    from superconductor_vae_tpu.checkpoint import ckpt_skew_transform
    ds = load_dataset(csv, max_len=mcfg.max_len,
                      tokenizer=default_tokenizer(max_len=mcfg.max_len),
                      skew_transform=ckpt_skew_transform(meta))
    n = min(n_samples, len(ds))
    b = ds.batch(np.arange(n))
    enc = MaterialsEncoder(mcfg)
    out = jax.jit(lambda p, *a: enc.apply(
        p, *a, method=MaterialsEncoder.encode))(
            restored['enc_params'], jnp.asarray(b['element_indices']),
            jnp.asarray(b['element_fractions']),
            jnp.asarray(b['element_mask']), jnp.asarray(b['magpie']),
            jnp.asarray(b['tc']))
    tc_k = ds.norm_stats.tc_to_kelvin(b['tc'])
    return (np.asarray(out['z']), tc_k, b['is_sc'].astype(bool),
            b['family'])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('cache', nargs='?', default=None,
                   help='latent_cache.npz from a training run')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--csv',
                   default='data/processed/jarvis_merged.csv.gz')
    p.add_argument('--n-samples', type=int, default=4096)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--top-k', type=int, default=5,
                   help='top Tc-correlated coordinates to list per block')
    args = p.parse_args()

    from superconductor_vae_tpu.models.physics_z import BLOCKS

    if args.cache:
        z, tc_k, is_sc, family = load_from_cache(args.cache)
    elif args.checkpoint:
        z, tc_k, is_sc, family = load_by_encoding(
            args.checkpoint, args.csv, args.n_samples, args.cpu)
    else:
        p.error('give a latent cache or --checkpoint')

    n = min(args.n_samples, len(z))
    z, tc_k, is_sc = z[:n], tc_k[:n], is_sc[:n]
    log_tc = np.log1p(np.clip(tc_k, 0, None))

    print(f'z: {z.shape}  global mean={z.mean():.4f} std={z.std():.4f} '
          f'min={z.min():.3f} max={z.max():.3f}')
    print(f'SC fraction: {is_sc.mean():.3f}   Tc range: '
          f'{tc_k.min():.1f}-{tc_k.max():.1f} K')
    print()
    print(f"{'block':<14}{'range':<12}{'mean':>8}{'std':>8}"
          f"{'x-var':>9}{'const':>7}{'|r(Tc)|max':>11}")
    print('-' * 69)

    for name, (s, e) in BLOCKS.items():
        blk = z[:, s:e]
        coord_stds = blk.std(axis=0)
        n_const = int((coord_stds < 0.01).sum())
        # per-coordinate correlation with log-Tc (SC rows only)
        sc_blk, sc_tc = blk[is_sc], log_tc[is_sc]
        if len(sc_blk) > 8:
            bc = sc_blk - sc_blk.mean(0)
            tcc = sc_tc - sc_tc.mean()
            denom = (np.linalg.norm(bc, axis=0)
                     * np.linalg.norm(tcc) + 1e-12)
            r = (bc.T @ tcc) / denom
        else:
            r = np.zeros(e - s)
        print(f'{name:<14}{f"[{s}:{e}]":<12}{blk.mean():>8.3f}'
              f'{blk.std():>8.3f}{blk.var(0).mean():>9.4f}'
              f'{n_const:>5}/{e - s:<3}{np.abs(r).max():>9.3f}')

    print()
    print(f'top {args.top_k} Tc-correlated coordinates per supervised block:')
    for name, (s, e) in BLOCKS.items():
        if name == 'discovery':
            continue
        sc_blk, sc_tc = z[is_sc, s:e], log_tc[is_sc]
        if len(sc_blk) <= 8:
            continue
        bc = sc_blk - sc_blk.mean(0)
        tcc = sc_tc - sc_tc.mean()
        r = (bc.T @ tcc) / (np.linalg.norm(bc, axis=0)
                            * np.linalg.norm(tcc) + 1e-12)
        order = np.argsort(-np.abs(r))[: args.top_k]
        coords = ', '.join(f'z[{s + i}]={r[i]:+.2f}' for i in order)
        print(f'  {name:<14}{coords}')

    # discovery-space activity: how much variance lives outside the
    # supervised prefix (the reference's "free" z[512:])
    sup_end = max(e for k, (s, e) in BLOCKS.items() if k != 'discovery')
    var_sup = z[:, :sup_end].var(0).sum()
    var_disc = z[:, sup_end:].var(0).sum()
    print()
    print(f'variance split: supervised z[:{sup_end}] {var_sup:.1f}  vs  '
          f'discovery z[{sup_end}:] {var_disc:.1f} '
          f'({var_disc / (var_sup + var_disc + 1e-9):.1%} in discovery space)')


if __name__ == '__main__':
    main()
