"""Checkpoint manifest: environment + config fingerprints.

Capability parity with the reference manifest system
(reference: src/superconductor/utils/manifest.py:105-221): records git SHA,
library versions, config hashes, and an architecture fingerprint; on resume a
drift check compares the stored manifest against the current run and reports
mismatched fields.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import platform
import subprocess
from typing import Dict, List


def _git_sha() -> str:
    try:
        return subprocess.run(
            ['git', 'rev-parse', 'HEAD'], capture_output=True, text=True,
            timeout=5).stdout.strip() or 'unknown'
    except Exception:
        return 'unknown'


def _hash_config(obj) -> str:
    try:
        blob = json.dumps(dataclasses.asdict(obj), sort_keys=True, default=str)
    except TypeError:
        blob = repr(obj)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def architecture_fingerprint(mcfg) -> str:
    key = (f'{mcfg.latent_dim}|{mcfg.d_model}|{mcfg.nhead}|{mcfg.num_layers}|'
           f'{mcfg.dim_feedforward}|{mcfg.vocab_size}|{mcfg.max_len}|'
           f'{mcfg.n_total_memory_tokens}|{mcfg.fusion_dim}')
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def build_manifest(mcfg, tcfg) -> Dict[str, str]:
    import jax
    return {
        'git_sha': _git_sha(),
        'platform': platform.platform(),
        'jax_version': jax.__version__,
        'backend': jax.default_backend(),
        'model_config_hash': _hash_config(mcfg),
        'train_config_hash': _hash_config(tcfg),
        'architecture_fingerprint': architecture_fingerprint(mcfg),
    }


def check_manifest_drift(saved: Dict[str, str], mcfg, tcfg) -> List[str]:
    """Returns a list of drifted fields (empty = clean resume)."""
    current = build_manifest(mcfg, tcfg)
    drift = []
    for key in ('architecture_fingerprint', 'model_config_hash',
                'train_config_hash'):
        if saved.get(key) != current[key]:
            drift.append(f'{key}: {saved.get(key)} -> {current[key]}')
    return drift
