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
                    tag: Optional[str] = None,
                    controllers: Optional[Dict] = None,
                    extra_arrays: Optional[Dict[str, Any]] = None,
                    include_opt: bool = True) -> Path:
    """Full-state checkpoint: params, BOTH optimizer states, step counter,
    and (via ``controllers``) the host scheduler state machines — the
    reference saves enc/dec optimizer + scheduler + controller states 'for
    proper resumption' (reference: train_v12_clean.py:3527-3597).  Optimizer
    states are stored as flattened leaf lists so restore does not depend on
    optax namedtuple reconstruction (see ``restore_opt_state``).
    """
    root = Path(root).resolve()
    root.mkdir(parents=True, exist_ok=True)
    path = root / tag if tag else _ckpt_dir(root, epoch)

    payload = {'step': state.step,
               'enc_params': state.enc_params,
               'dec_params': state.dec_params}
    if include_opt:
        # optimizer states triple the payload.  Callers may skip them for
        # export-style saves, but every train-loop save (incl. 'best') keeps
        # them: latest_checkpoint picks the HIGHEST-epoch checkpoint, and
        # 'best' is often the newest — resuming it without Adam moments
        # warm-restarts the optimizer (observed on run2 @ epoch 211)
        payload['enc_opt'] = jax.tree.leaves(state.enc_opt)
        payload['dec_opt'] = jax.tree.leaves(state.dec_opt)
    if getattr(state, 'set_params', None) is not None:
        payload['set_params'] = state.set_params
        if include_opt:
            payload['set_opt'] = jax.tree.leaves(state.set_opt)
    if getattr(state, 'pz_params', None) is not None:
        payload['pz_params'] = state.pz_params
        if include_opt:
            payload['pz_opt'] = jax.tree.leaves(state.pz_opt)
    if extra_arrays:
        payload.update(extra_arrays)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / 'state', jax.device_get(payload), force=True)

    meta = {
        'epoch': epoch,
        'metrics': metrics or {},
        'model_config': dataclasses.asdict(mcfg),
        'manifest': build_manifest(mcfg, tcfg),
        'controllers': controllers or {},
        # decode-gating knobs, so offline eval (scripts/evaluate.py)
        # reproduces the training-time generation settings exactly
        'eval_gating': {
            'stop_boost': tcfg.stop_boost,
            'hard_stop_threshold': tcfg.hard_stop_threshold,
            'site_dup_threshold': tcfg.site_dup_threshold,
            'use_type_masking_ar': tcfg.use_type_masking_ar,
        },
        # data normalization the params were trained under, so offline
        # eval / holdout search reload the SAME corpus transform (a
        # checkpoint trained on legacy rank-gauss inputs evaluated on a
        # quantile-normalized corpus silently shifts every encoder input);
        # checkpoints without this key predate it -> 'rank_gauss'
        'data_norm': {
            'skew_transform': getattr(tcfg, 'skew_transform', 'quantile'),
            'order_augment': getattr(tcfg, 'order_augment', 0),
        },
    }
    (path / 'meta.json').write_text(json.dumps(meta, indent=2, default=str))
    return path


def ckpt_skew_transform(meta: Dict) -> str:
    """The Magpie skew transform a checkpoint's params were trained under.
    Checkpoints saved before the 'data_norm' meta key trained on the legacy
    jittered rank-gauss corpus — offline eval must reload with the same
    transform or every encoder input shifts."""
    return (meta.get('data_norm') or {}).get('skew_transform', 'rank_gauss')


def restore_opt_state(template: Any, leaves) -> Any:
    """Rebuild an optax state pytree from its flattened leaf list using a
    freshly-initialized state of the same optimizer as the structure."""
    treedef = jax.tree.structure(template)
    leaves = [leaves[k] for k in sorted(leaves, key=int)] \
        if isinstance(leaves, dict) else list(leaves)
    return jax.tree.unflatten(treedef, leaves)


def latest_checkpoint(root: str | Path) -> Optional[Path]:
    """'auto' resume resolution: the checkpoint with the HIGHEST epoch wins
    (epoch_* dirs and the 'best'/'interrupt' tags all compete) so a crash
    loop never rewinds to a much older 'best'
    (reference: train_v12_clean.py:1122 _find_best_checkpoint)."""
    root = Path(root)
    if not root.exists():
        return None
    candidates = []
    for p in list(root.glob('epoch_*')) + [root / 'best', root / 'interrupt']:
        meta = p / 'meta.json'
        # require the payload too: a crash mid-save leaves meta.json next
        # to an orbax tmp dir, and resuming such a checkpoint crash-loops
        # the resilient driver (observed on run3: kill during a 'best'
        # write left state.orbax-checkpoint-tmp only)
        if meta.exists() and (p / 'state').exists():
            try:
                ep = int(json.loads(meta.read_text()).get('epoch', -1))
            except (ValueError, json.JSONDecodeError):
                continue
            # on ties (best saved at the same epoch) prefer the epoch_ dir
            candidates.append((ep, 1 if p.name.startswith('epoch_') else 0, p))
    if not candidates:
        return None
    return max(candidates, key=lambda t: (t[0], t[1]))[2]


def load_checkpoint(path: str | Path) -> Tuple[Dict[str, Any], Dict]:
    """Returns (state_dict {step, enc_params, dec_params}, meta)."""
    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path / 'state')
    meta = json.loads((path / 'meta.json').read_text())
    return restored, meta
