"""PyTorch checkpoint -> JAX param-pytree conversion.

The migration analogue for the reference's torch checkpoints
(reference: scripts/train_v12_clean.py:3503-3597 save format with
'encoder_state_dict' / 'decoder_state_dict'; loader semantics at
load_checkpoint :4061-4425).  Maps every reference parameter name to its
location in our Flax trees, transposing Linear kernels and splitting the
fused in_proj QKV weights of ``nn.MultiheadAttention`` into separate
q/k/v Dense kernels.

Unmapped reference params (the unused property_encoder/combiner inside
ElementEmbedding, disabled skip_to_memory/numden_head) are skipped —
mirroring the reference's own strict=False loading for legacy weights.

Numerical parity gate: tests/test_torch_parity.py builds the actual
reference modules (torch CPU), converts random-initialized state dicts, and
asserts encoder outputs and decoder TF logits agree to tolerance.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.config import ModelConfig


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _to_np(v) -> np.ndarray:
    try:  # torch tensor
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def _set(tree: Dict, path: Tuple[str, ...], leaf: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _linear(tree, sd, torch_prefix, flax_path):
    _set(tree, flax_path, 'kernel', _t(_to_np(sd[f'{torch_prefix}.weight'])))
    if f'{torch_prefix}.bias' in sd:
        _set(tree, flax_path, 'bias', _to_np(sd[f'{torch_prefix}.bias']))


def _layernorm(tree, sd, torch_prefix, flax_path):
    _set(tree, flax_path, 'scale', _to_np(sd[f'{torch_prefix}.weight']))
    _set(tree, flax_path, 'bias', _to_np(sd[f'{torch_prefix}.bias']))


def convert_encoder_state(sd: Dict, cfg: ModelConfig) -> Dict:
    """Reference FullMaterialsVAE state_dict -> MaterialsEncoder params."""
    p: Dict = {}

    # element branch
    _set(p, ('element_encoder', 'element_embed'), 'embedding',
         _to_np(sd['element_encoder.element_embedding.element_embed.weight']))
    ea = 'element_encoder.element_attention'
    _set(p, ('element_encoder', 'element_attention'), 'query',
         _to_np(sd[f'{ea}.query']))
    _linear(p, sd, f'{ea}.key_proj',
            ('element_encoder', 'element_attention', 'key_proj'))
    _linear(p, sd, f'{ea}.value_proj',
            ('element_encoder', 'element_attention', 'value_proj'))
    _linear(p, sd, f'{ea}.output_proj',
            ('element_encoder', 'element_attention', 'output_proj'))
    _layernorm(p, sd, f'{ea}.layer_norm',
               ('element_encoder', 'element_attention', 'LayerNorm_0'))
    _linear(p, sd, 'element_encoder.output_projection.0',
            ('element_encoder', 'output_projection', 'Dense_0'))
    _layernorm(p, sd, 'element_encoder.output_projection.1',
               ('element_encoder', 'output_projection', 'LayerNorm_0'))

    # magpie / tc branches, fusion, latent
    for i, (d_idx, ln_idx) in enumerate(((0, 1), (4, 5))):
        _linear(p, sd, f'magpie_encoder.{d_idx}',
                ('magpie_encoder', f'Dense_{i}'))
        _layernorm(p, sd, f'magpie_encoder.{ln_idx}',
                   ('magpie_encoder', f'LayerNorm_{i}'))
    _linear(p, sd, 'tc_encoder.0', ('tc_encoder_pre', 'Dense_0'))
    _linear(p, sd, 'tc_encoder.2', ('tc_encoder_pre', 'Dense_1'))
    _layernorm(p, sd, 'tc_encoder.3', ('tc_encoder_ln',))
    _linear(p, sd, 'fusion.0', ('fusion', 'Dense_0'))
    _layernorm(p, sd, 'fusion.1', ('fusion', 'LayerNorm_0'))
    for i, (d_idx, ln_idx) in enumerate(((0, 1), (3, 4))):
        _linear(p, sd, f'vae_encoder.encoder.{d_idx}',
                ('latent_mlp', f'Dense_{i}'))
        _layernorm(p, sd, f'vae_encoder.encoder.{ln_idx}',
                   ('latent_mlp', f'LayerNorm_{i}'))
    _linear(p, sd, 'vae_encoder.fc_mean', ('fc_mean',))

    # backbone + heads
    for i, (d_idx, ln_idx) in enumerate(((0, 1), (4, 5))):
        _linear(p, sd, f'decoder_backbone.{d_idx}',
                ('decoder_backbone', f'Dense_{i}'))
        _layernorm(p, sd, f'decoder_backbone.{ln_idx}',
                   ('decoder_backbone', f'LayerNorm_{i}'))
    _linear(p, sd, 'tc_proj', ('tc_proj',))
    _linear(p, sd, 'tc_res_block.0', ('tc_res_block', 'Dense_0'))
    _layernorm(p, sd, 'tc_res_block.1', ('tc_res_block', 'LayerNorm_0'))
    _linear(p, sd, 'tc_res_block.4', ('tc_res_block', 'Dense_1'))
    _layernorm(p, sd, 'tc_out.0', ('tc_out_ln',))
    _linear(p, sd, 'tc_out.2', ('tc_out_1',))
    _linear(p, sd, 'tc_out.4', ('tc_out_2',))
    _linear(p, sd, 'magpie_head.0', ('magpie_head', 'Dense_0'))
    _linear(p, sd, 'magpie_head.2', ('magpie_head', 'Dense_1'))
    _linear(p, sd, 'attended_head.0', ('attended_head',))
    _layernorm(p, sd, 'attended_head.1', ('attended_head_ln',))
    _linear(p, sd, 'competence_head.0', ('competence_head', 'Dense_0'))
    _linear(p, sd, 'competence_head.2', ('competence_head', 'Dense_1'))
    _linear(p, sd, 'fraction_head.0', ('fraction_d0',))
    _layernorm(p, sd, 'fraction_head.1', ('fraction_ln',))
    _linear(p, sd, 'fraction_head.4', ('fraction_d1',))
    _linear(p, sd, 'fraction_head.6', ('fraction_d2',))
    _linear(p, sd, 'hp_head.0', ('hp_d0',))
    _linear(p, sd, 'hp_head.2', ('hp_d1',))
    _linear(p, sd, 'tc_class_head.0', ('tc_class_head', 'Dense_0'))
    _linear(p, sd, 'tc_class_head.3', ('tc_class_head', 'Dense_1'))
    _linear(p, sd, 'sc_head.0', ('sc_d0',))
    _layernorm(p, sd, 'sc_head.2', ('sc_ln',))
    _linear(p, sd, 'sc_head.4', ('sc_d1',))
    _linear(p, sd, 'sc_head.6', ('sc_d2',))

    fam = 'hierarchical_family_head'
    for head, fx in (('coarse_head', 'coarse'),
                     ('cuprate_sub_head', 'cuprate_sub')):
        _linear(p, sd, f'{fam}.{head}.0', ('family_head', f'{fx}_d0'))
        _layernorm(p, sd, f'{fam}.{head}.1', ('family_head', f'{fx}_ln'))
        _linear(p, sd, f'{fam}.{head}.4', ('family_head', f'{fx}_d1'))
        _linear(p, sd, f'{fam}.{head}.6', ('family_head', f'{fx}_out'))
    _linear(p, sd, f'{fam}.iron_sub_head.0', ('family_head', 'iron_sub_d0'))
    _layernorm(p, sd, f'{fam}.iron_sub_head.1', ('family_head', 'iron_sub_ln'))
    _linear(p, sd, f'{fam}.iron_sub_head.4', ('family_head', 'iron_sub_out'))

    return {'params': p}


def convert_decoder_state(sd: Dict, cfg: ModelConfig) -> Dict:
    """Reference EnhancedTransformerDecoder state_dict -> FormulaDecoder."""
    p: Dict = {}
    _set(p, ('token_embedding',), 'embedding',
         _to_np(sd['token_embedding.weight']))

    mb = ('memory_builder',)
    if cfg.memory_bottleneck_dim > 0:
        _linear(p, sd, 'latent_to_memory.0', mb + ('latent_bottleneck',))
        _layernorm(p, sd, 'latent_to_memory.1', mb + ('LayerNorm_0',))
        _linear(p, sd, 'latent_to_memory.3', mb + ('latent_out',))
        stoich_ln, heads_ln = 'LayerNorm_1', 'LayerNorm_2'
    else:
        _linear(p, sd, 'latent_to_memory.0', mb + ('latent_mid',))
        _linear(p, sd, 'latent_to_memory.2', mb + ('latent_out',))
        stoich_ln, heads_ln = 'LayerNorm_0', 'LayerNorm_1'
    _linear(p, sd, 'stoich_to_memory.0', mb + ('stoich_mid',))
    _layernorm(p, sd, 'stoich_to_memory.1', mb + (stoich_ln,))
    _linear(p, sd, 'stoich_to_memory.3', mb + ('stoich_out',))
    _linear(p, sd, 'heads_to_memory.0', mb + ('heads_mid1',))
    _layernorm(p, sd, 'heads_to_memory.1', mb + (heads_ln,))
    _linear(p, sd, 'heads_to_memory.3', mb + ('heads_mid2',))
    _linear(p, sd, 'heads_to_memory.5', mb + ('heads_out',))

    d = cfg.d_model
    for i in range(cfg.num_layers):
        tl = f'transformer_decoder.layers.{i}'
        fl = (f'layer_{i}',)
        # fused self-attention QKV -> separate Dense kernels
        w = _to_np(sd[f'{tl}.self_attn.in_proj_weight'])
        b = _to_np(sd[f'{tl}.self_attn.in_proj_bias'])
        for j, name in enumerate(('self_q', 'self_k', 'self_v')):
            _set(p, fl + (name,), 'kernel', _t(w[j * d:(j + 1) * d]))
            _set(p, fl + (name,), 'bias', b[j * d:(j + 1) * d])
        _linear(p, sd, f'{tl}.self_attn.out_proj', fl + ('self_o',))
        w = _to_np(sd[f'{tl}.multihead_attn.in_proj_weight'])
        b = _to_np(sd[f'{tl}.multihead_attn.in_proj_bias'])
        for j, name in enumerate(('cross_q', 'cross_k', 'cross_v')):
            _set(p, fl + (name,), 'kernel', _t(w[j * d:(j + 1) * d]))
            _set(p, fl + (name,), 'bias', b[j * d:(j + 1) * d])
        _linear(p, sd, f'{tl}.multihead_attn.out_proj', fl + ('cross_o',))
        _linear(p, sd, f'{tl}.linear1', fl + ('ff1',))
        _linear(p, sd, f'{tl}.linear2', fl + ('ff2',))
        for n in (1, 2, 3):
            _layernorm(p, sd, f'{tl}.norm{n}', fl + (f'norm{n}',))

    _layernorm(p, sd, 'output_proj.0', ('out_ln',))
    _linear(p, sd, 'output_proj.1', ('out_d1',))
    _linear(p, sd, 'output_proj.4', ('out_d2',))
    _linear(p, sd, 'stop_head.0', ('stop_d1',))
    _linear(p, sd, 'stop_head.2', ('stop_d2',))
    _linear(p, sd, 'site_dup_head.0', ('dup_d1',))
    _linear(p, sd, 'site_dup_head.2', ('dup_d2',))
    _layernorm(p, sd, 'token_type_head.0', ('type_ln',))
    _linear(p, sd, 'token_type_head.1', ('type_d1',))
    _linear(p, sd, 'token_type_head.4', ('type_d2',))
    _linear(p, sd, 'token_type_head.7', ('type_d3',))
    return {'params': p}


def model_config_from_torch(ckpt: Dict) -> ModelConfig:
    """Auto-detect architecture dims from a reference checkpoint, mirroring
    the reference's downstream detection (holdout_search_targeted.py:200)."""
    dec = ckpt['decoder_state_dict']
    enc = ckpt['encoder_state_dict']
    d_model = _to_np(dec['token_embedding.weight']).shape[1]
    vocab = _to_np(dec['token_embedding.weight']).shape[0]
    n_layers = 1 + max(int(re.match(r'transformer_decoder\.layers\.(\d+)\.', k).group(1))
                       for k in dec if k.startswith('transformer_decoder.layers.'))
    ffn = _to_np(dec[f'transformer_decoder.layers.0.linear1.weight']).shape[0]
    latent = _to_np(enc['vae_encoder.fc_mean.weight']).shape[0]
    fusion = _to_np(enc['tc_encoder.2.weight']).shape[0]
    magpie = _to_np(enc['magpie_head.2.weight']).shape[0]
    elem_embed = _to_np(
        enc['element_encoder.element_embedding.element_embed.weight']).shape[1]
    bottleneck = 0
    if 'latent_to_memory.3.weight' in dec:
        bottleneck = _to_np(dec['latent_to_memory.0.weight']).shape[0]
    return ModelConfig(
        latent_dim=latent, fusion_dim=fusion, magpie_dim=magpie,
        encoder_hidden=(fusion * 2, fusion), decoder_hidden=(fusion, fusion * 2),
        element_embed_dim=elem_embed, vocab_size=vocab, d_model=d_model,
        num_layers=n_layers, dim_feedforward=ffn,
        memory_bottleneck_dim=bottleneck,
    )


def convert_physics_z_state(ckpt: Dict) -> Dict:
    """Learnable Magpie projection from the reference's saved loss-module
    state (reference: train_v12_clean.py:3542-3544 saves
    ``physics_z_loss_fn_state_dict`` with ``magpie_loss.projection.*``).
    Returns {} when the checkpoint predates V12.31."""
    sd = ckpt.get('physics_z_loss_fn_state_dict') or {}
    if 'magpie_loss.projection.weight' not in sd:
        return {}
    return {
        'kernel': _t(_to_np(sd['magpie_loss.projection.weight'])),
        'bias': _to_np(sd['magpie_loss.projection.bias']),
    }


def load_torch_checkpoint(path: str) -> Tuple[Dict, Dict, ModelConfig, Dict]:
    """.pt file -> (enc_params, dec_params, model_config, metadata).

    Metadata includes ``pz_params`` (the learnable Magpie projection) when
    the reference checkpoint carries the physics-Z loss-module state.
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    cfg = model_config_from_torch(ckpt)
    enc = convert_encoder_state(ckpt['encoder_state_dict'], cfg)
    dec = convert_decoder_state(ckpt['decoder_state_dict'], cfg)
    meta = {k: v for k, v in ckpt.items()
            if not k.endswith('state_dict') and np.isscalar(v)}
    pz = convert_physics_z_state(ckpt)
    if pz:
        meta['pz_params'] = pz
    return enc, dec, cfg, meta
