"""Checkpoint auto-migration chain, applied on resume.

Capability parity with the reference's resume-time migration: it peeks the
checkpoint's vocab size and architecture dims and chains V13->V14->V15
upgrades before loading (reference: scripts/train_v12_clean.py:6497-6565
``auto-detect and migrate checkpoint``).  Here the chain is a pure
pytree -> pytree transform over the restored payload:

  1. decoder vocab expansion (embedding rows + output-head columns, isotope
     rows seeded from parent-element embeddings — models/surgery.py)
  2. Magpie feature-dim adaptation (encoder input branch zero-padded /
     truncated, prediction head grown with fresh init) for checkpoints
     trained on a different featurizer layout (78-dim native vs the
     reference corpus' 145-dim; see chem/featurize.fit_magpie_bridge for
     the loss-free data-side bridge)
  3. physics-Z Magpie projection re-init when its input dim drifted

Optimizer states of migrated modules are dropped (their shapes changed);
everything else resumes normally.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..models.surgery import expand_decoder_vocab, isotope_parent_map

_XAVIER_SCALE = 1.0  # xavier-uniform bound factor for fresh head columns


def _resize_rows(kernel: np.ndarray, new_in: int) -> np.ndarray:
    """Grow (zero-pad: new inputs initially ignored — function preserving)
    or shrink (truncate) the input dimension of a Dense kernel."""
    old = kernel.shape[0]
    if new_in == old:
        return kernel
    if new_in < old:
        return kernel[:new_in]
    pad = np.zeros((new_in - old,) + kernel.shape[1:], kernel.dtype)
    return np.concatenate([kernel, pad], axis=0)


def _resize_out(kernel: np.ndarray, bias: np.ndarray, new_out: int,
                rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Grow (fresh xavier columns) or shrink (truncate) a Dense output."""
    old = kernel.shape[1]
    if new_out == old:
        return kernel, bias
    if new_out < old:
        return kernel[:, :new_out], bias[:new_out]
    bound = _XAVIER_SCALE * np.sqrt(6.0 / (kernel.shape[0] + new_out))
    fresh = rng.uniform(-bound, bound,
                        (kernel.shape[0], new_out - old)).astype(kernel.dtype)
    k = np.concatenate([kernel, fresh], axis=1)
    b = np.concatenate([bias, np.zeros(new_out - old, bias.dtype)])
    return k, b


def auto_migrate(restored: Dict, meta: Dict, mcfg, tokenizer=None,
                 seed: int = 0) -> Tuple[Dict, List[str]]:
    """Detect architecture drift between a restored checkpoint and the
    current ``ModelConfig`` and chain the necessary upgrades.

    Returns (migrated payload, list of human-readable actions taken);
    an empty action list means the checkpoint loaded as-is.
    """
    actions: List[str] = []
    rng = np.random.default_rng(seed)

    # ---- 1. decoder vocab ---------------------------------------------------
    dec = restored.get('dec_params')
    if dec is not None:
        emb = np.asarray(dec['params']['token_embedding']['embedding'])
        old_v = emb.shape[0]
        if old_v < mcfg.vocab_size:
            parent = isotope_parent_map(tokenizer) if tokenizer else None
            restored['dec_params'] = expand_decoder_vocab(
                dec, mcfg.vocab_size, parent)
            restored.pop('dec_opt', None)
            actions.append(
                f'decoder vocab {old_v}->{mcfg.vocab_size} '
                f'(embedding rows + out_d2 columns'
                f'{", isotope rows from parents" if parent else ""}; '
                f'dec_opt reset)')
        elif old_v > mcfg.vocab_size:
            raise ValueError(
                f'checkpoint vocab {old_v} > model vocab {mcfg.vocab_size}: '
                f'shrinking is not a supported migration')

    # ---- 2. Magpie feature dim (encoder input branch + prediction head) ----
    enc = restored.get('enc_params')
    if enc is not None:
        root = None
        try:
            root = enc['params']
            old_m = np.asarray(
                root['magpie_encoder']['Dense_0']['kernel']).shape[0]
        except (KeyError, TypeError):
            old_m = None
        if old_m is not None and old_m != mcfg.magpie_dim:
            enc = jax.tree.map(np.array, enc)
            root = enc['params']
            d0 = root['magpie_encoder']['Dense_0']
            d0['kernel'] = _resize_rows(d0['kernel'], mcfg.magpie_dim)
            # magpie prediction head: last Dense of the head MLP
            head = root['magpie_head']
            last = f'Dense_{len([k for k in head if k.startswith("Dense_")]) - 1}'
            head[last]['kernel'], head[last]['bias'] = _resize_out(
                head[last]['kernel'], head[last]['bias'], mcfg.magpie_dim,
                rng)
            restored['enc_params'] = enc
            restored.pop('enc_opt', None)
            actions.append(
                f'magpie dim {old_m}->{mcfg.magpie_dim} (encoder branch '
                f'zero-padded/truncated, head columns fresh; enc_opt reset). '
                f'NOTE: feature layouts differ across corpora — prefer the '
                f'data-side bridge (chem/featurize.fit_magpie_bridge)')

    # ---- 3. physics-Z Magpie projection -------------------------------------
    pz = restored.get('pz_params')
    if pz is not None and 'kernel' in pz:
        k = np.asarray(pz['kernel'])
        if k.shape[0] != mcfg.magpie_dim:
            from ..ops.physics_z_loss import init_magpie_proj
            import jax.random as jrandom
            fresh = init_magpie_proj(jrandom.PRNGKey(seed), mcfg.magpie_dim,
                                     out_dim=k.shape[1])
            restored['pz_params'] = jax.tree.map(np.asarray, fresh)
            restored.pop('pz_opt', None)
            actions.append(
                f'physics-Z magpie projection {k.shape[0]}->'
                f'{mcfg.magpie_dim} re-initialized (pz_opt reset)')

    return restored, actions
