"""Orbax checkpointing with manifest metadata.

Replaces the reference's single-file ``torch.save`` checkpoints
(reference: scripts/train_v12_clean.py:3503-3597 ``save_checkpoint``) with
Orbax PyTree checkpoints: async-capable, multi-host-safe, and carrying the
same auto-detection metadata (architecture dims + vocab size) plus the
manifest (git SHA, config hash) used for drift detection on resume
(reference: utils/manifest.py:105-137).
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.config import ModelConfig
from .manifest import build_manifest


def _ckpt_dir(root: Path, epoch: int) -> Path:
    return root / f'epoch_{epoch:05d}'


def save_checkpoint(root: str | Path, state, mcfg: ModelConfig, tcfg,
                    epoch: int, metrics: Optional[Dict] = None,
                    tag: Optional[str] = None) -> Path:
    root = Path(root).resolve()
    root.mkdir(parents=True, exist_ok=True)
    path = root / tag if tag else _ckpt_dir(root, epoch)

    payload = {'step': state.step,
               'enc_params': state.enc_params,
               'dec_params': state.dec_params}
    if getattr(state, 'set_params', None) is not None:
        payload['set_params'] = state.set_params
    if getattr(state, 'pz_params', None) is not None:
        payload['pz_params'] = state.pz_params
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / 'state', jax.device_get(payload), force=True)

    meta = {
        'epoch': epoch,
        'metrics': metrics or {},
        'model_config': dataclasses.asdict(mcfg),
        'manifest': build_manifest(mcfg, tcfg),
    }
    (path / 'meta.json').write_text(json.dumps(meta, indent=2, default=str))
    return path


def latest_checkpoint(root: str | Path) -> Optional[Path]:
    """'auto' resume resolution: prefer tag 'best', else highest epoch
    (reference: train_v12_clean.py:1122 _find_best_checkpoint)."""
    root = Path(root)
    if not root.exists():
        return None
    best = root / 'best'
    if (best / 'meta.json').exists():
        return best
    epochs = sorted(root.glob('epoch_*'),
                    key=lambda p: int(re.findall(r'\d+', p.name)[-1]))
    return epochs[-1] if epochs else None


def load_checkpoint(path: str | Path) -> Tuple[Dict[str, Any], Dict]:
    """Returns (state_dict {step, enc_params, dec_params}, meta)."""
    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path / 'state')
    meta = json.loads((path / 'meta.json').read_text())
    return restored, meta
