#!/usr/bin/env python3
"""Latent-space topology CLI over z-cache files.

Behavioral equivalent of the reference CLI
(reference: scripts/analysis/compute_topology.py: compact / --full /
--hdbscan / --longitudinal modes over latent caches, JSONL output).

Usage:
    python scripts/compute_topology.py outputs/run3/latent_cache.npz
    python scripts/compute_topology.py outputs/run3/latent_cache.npz --full
    python scripts/compute_topology.py --longitudinal 'outputs/*/latent_cache.npz'
"""

import argparse
import glob
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _to_f32(a):
    if a.dtype.kind == 'V':
        import ml_dtypes
        a = a.view(ml_dtypes.bfloat16)
    return a.astype(np.float32)


def analyze_cache(path, k, n_samples, full):
    from superconductor_vae_tpu.analysis.topology import TopologyAnalyzer
    blob = np.load(path)
    z = _to_f32(blob['z'])[:n_samples]
    is_sc = blob['is_sc'][:n_samples].astype(np.int32)
    tc_k = _to_f32(blob['tc_kelvin'])[:n_samples]
    out = TopologyAnalyzer(k=k).analyze(z, is_sc=is_sc, tc_kelvin=tc_k,
                                        full=full)
    out['cache'] = str(path)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('cache', nargs='?',
                   default='outputs/run3/latent_cache.npz')
    p.add_argument('--k', type=int, default=20)
    p.add_argument('--n-samples', type=int, default=4096)
    p.add_argument('--full', action='store_true',
                   help='include per-cluster quality + per-sample tiers')
    p.add_argument('--longitudinal', default=None, metavar='GLOB',
                   help='analyze every cache matching a glob, one JSONL '
                        'line each')
    p.add_argument('--out', default=None, help='append JSONL here')
    args = p.parse_args()

    paths = (sorted(glob.glob(args.longitudinal)) if args.longitudinal
             else [args.cache])
    if not paths:
        print('no caches matched')
        return

    for path in paths:
        out = analyze_cache(path, args.k, args.n_samples, args.full)
        line = json.dumps({k: v for k, v in out.items()
                           if not isinstance(v, np.ndarray)},
                          default=float)
        if args.out:
            with open(args.out, 'a') as f:
                f.write(line + '\n')
        if len(paths) == 1:
            # human-readable compact report
            keys = ('n_samples', 'intrinsic_dim_mle', 'intrinsic_dim_mle_sc',
                    'correlation_dim', 'pca_effective_rank', 'z_norm_mean',
                    'knn_radius_mean', 'sc_boundary_ratio',
                    'boundary_fraction', 'n_clusters_hdbscan',
                    'cluster_noise_fraction')
            for key in keys:
                if key in out:
                    v = out[key]
                    sv = f'{v:.4f}' if isinstance(v, float) else str(v)
                    print(f'  {key:<26}{sv}')
        else:
            print(line)


if __name__ == '__main__':
    main()
