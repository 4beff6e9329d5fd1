"""Function-preserving model surgery (Net2Net-style) on param pytrees.

Capability parity with the reference expansion toolkit
(reference: src/superconductor/models/net2net_expansion.py:28-1443:
widen/deepen for Linear/Embedding/LayerNorm/MHA/decoder-layers, whole-model
expanders, PE recompute; and the vocab-expansion migrations in
scripts/migrate_* with isotope rows initialized from parent-element
embeddings).

In JAX these are pure pytree -> pytree transforms: no module mutation, the
new params simply target a larger ``ModelConfig``.  Positional-encoding
"recompute" is free here — the PE table is derived from config, not stored.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np


def _np(x):
    return np.asarray(x)


def widen_dense_pair(
    kernel1: np.ndarray, bias1: np.ndarray, kernel2: np.ndarray,
    new_width: int, rng: np.random.Generator, noise: float = 1e-3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Net2WiderNet on a Dense->Dense pair (function preserving).

    kernel1: [in, w] -> [in, new_width]; kernel2: [w, out] -> [new_width, out].
    New units replicate random old units; the consumer rows are divided by
    replication multiplicity so outputs are unchanged (up to tie-break noise).
    Returns (k1', b1', k2', mapping).
    """
    k1, b1, k2 = _np(kernel1), _np(bias1), _np(kernel2)
    w = k1.shape[1]
    assert new_width >= w
    mapping = np.concatenate([np.arange(w),
                              rng.integers(0, w, new_width - w)])
    counts = np.bincount(mapping, minlength=w).astype(k2.dtype)

    k1_new = k1[:, mapping] + noise * rng.standard_normal(
        (k1.shape[0], new_width)).astype(k1.dtype) * (np.arange(new_width) >= w)
    b1_new = b1[mapping]
    k2_new = (k2[mapping, :].T / counts[mapping]).T
    return k1_new, b1_new, k2_new.astype(k2.dtype), mapping


def widen_layernorm(scale: np.ndarray, bias: np.ndarray,
                    mapping: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return _np(scale)[mapping], _np(bias)[mapping]


def expand_vocab_rows(
    embedding: np.ndarray,             # [V_old, d]
    new_vocab: int,
    parent_map: Optional[Dict[int, int]] = None,
    rng: Optional[np.random.Generator] = None,
    init_scale: float = 0.02,
) -> np.ndarray:
    """Grow the token embedding to ``new_vocab`` rows.

    ``parent_map[new_id] = old_id`` initializes new rows from a semantic
    parent (e.g. ISO:18O from O — the reference's isotope-row init,
    reference: train_v12_clean.py load_checkpoint:4114-4180); unmapped rows
    get small random init.
    """
    emb = _np(embedding)
    v_old, d = emb.shape
    rng = rng or np.random.default_rng(0)
    out = np.concatenate(
        [emb, init_scale * rng.standard_normal(
            (new_vocab - v_old, d)).astype(emb.dtype)], axis=0)
    if parent_map:
        for new_id, old_id in parent_map.items():
            if v_old <= new_id < new_vocab and old_id < v_old:
                out[new_id] = emb[old_id] + init_scale * \
                    rng.standard_normal(d).astype(emb.dtype)
    return out


def expand_output_head_rows(
    kernel: np.ndarray,                # [d, V_old]
    bias: np.ndarray,                  # [V_old]
    new_vocab: int,
    parent_map: Optional[Dict[int, int]] = None,
    new_bias_value: float = -4.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Grow a vocab projection; new logits start suppressed (bias -4) or
    copy their parent row."""
    k, b = _np(kernel), _np(bias)
    d, v_old = k.shape
    k_new = np.concatenate(
        [k, np.zeros((d, new_vocab - v_old), k.dtype)], axis=1)
    b_new = np.concatenate(
        [b, np.full(new_vocab - v_old, new_bias_value, b.dtype)])
    if parent_map:
        for new_id, old_id in parent_map.items():
            if v_old <= new_id < new_vocab and old_id < v_old:
                k_new[:, new_id] = k[:, old_id]
                b_new[new_id] = b[old_id]
    return k_new, b_new


def isotope_parent_map(tokenizer) -> Dict[int, int]:
    """ISO token id -> parent element token id (for vocab migration init)."""
    out = {}
    if not tokenizer.isotopes:
        return out
    from ..chem.isotopes import parse_isotope
    for i, iso in enumerate(tokenizer.isotopes):
        _, sym = parse_isotope(iso)
        out[tokenizer.isotope_token_start + i] = tokenizer.token_id(sym)
    return out


def identity_decoder_layer(layer_params: Dict) -> Dict:
    """Zero a decoder layer's residual-writing projections so inserting it is
    a function-preserving deepen (pre-norm residual blocks collapse to
    identity when self_o/cross_o/ff2 are zero)."""
    new = jax.tree.map(np.array, layer_params)
    for name in ('self_o', 'cross_o', 'ff2'):
        if name in new:
            new[name]['kernel'] = np.zeros_like(new[name]['kernel'])
            new[name]['bias'] = np.zeros_like(new[name]['bias'])
    return new


def deepen_decoder(dec_params: Dict, n_new_layers: int) -> Dict:
    """Append identity-initialized layers after the existing stack.

    Returns a params pytree targeting ``num_layers + n_new_layers``; the new
    layers are clones of the last layer with zeroed residual projections.
    """
    params = jax.tree.map(np.array, dec_params)
    root = params['params']
    layer_ids = sorted(int(k.split('_')[1]) for k in root
                       if k.startswith('layer_'))
    last = root[f'layer_{layer_ids[-1]}']
    for i in range(n_new_layers):
        root[f'layer_{layer_ids[-1] + 1 + i}'] = identity_decoder_layer(last)
    return params


def expand_decoder_vocab(dec_params: Dict, new_vocab: int,
                         parent_map: Optional[Dict[int, int]] = None) -> Dict:
    """Vocab migration for the formula decoder: grows token_embedding rows
    and the output projection columns (out_d2)."""
    params = jax.tree.map(np.array, dec_params)
    root = params['params']
    root['token_embedding']['embedding'] = expand_vocab_rows(
        root['token_embedding']['embedding'], new_vocab, parent_map)
    k, b = expand_output_head_rows(
        root['out_d2']['kernel'], root['out_d2']['bias'], new_vocab,
        parent_map)
    root['out_d2']['kernel'] = k
    root['out_d2']['bias'] = b
    return params


def upgrade_tc_head(enc_params: Dict, old_tc_head: Dict) -> Dict:
    """Transfer a legacy 2-layer tc_head into the residual Tc stack
    (reference: attention_vae.py:858-899 upgrade_tc_head_from_checkpoint):
    proj inherits layer-0 weights; the final 128->1 gets the old head's first
    128 input connections; the intermediate 256->128 becomes a slice-identity.
    """
    params = jax.tree.map(np.array, enc_params)
    root = params['params']
    if 'kernel0' in old_tc_head:
        root['tc_proj']['kernel'] = old_tc_head['kernel0']
        root['tc_proj']['bias'] = old_tc_head['bias0']
    if 'kernel1' in old_tc_head:
        old_w = old_tc_head['kernel1']          # [256, 1]
        out1 = root['tc_out_1']                 # Dense 256 -> 128
        out2 = root['tc_out_2']                 # Dense 128 -> 1
        eye = np.zeros_like(out1['kernel'])
        n = min(eye.shape[0], eye.shape[1])
        eye[np.arange(n), np.arange(n)] = 1.0
        out1['kernel'] = eye
        out1['bias'] = np.zeros_like(out1['bias'])
        out2['kernel'] = old_w[:out2['kernel'].shape[0], :]
        out2['bias'] = old_tc_head['bias1']
    return params
