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


# ---- whole-model decoder expansion -------------------------------------------

def widened_config(cfg, new_d_model: int, new_dim_feedforward: int):
    """The ModelConfig an ``expand_decoder_width`` result targets: new
    widths, with ``pos_dim`` pinned to the ORIGINAL model's positional
    base so the widened decoder keeps (a channel-duplication of) the same
    sinusoidal table — the piece that makes whole-model widening exactly
    function-preserving end to end."""
    import dataclasses as _dc
    return _dc.replace(cfg, d_model=new_d_model,
                       dim_feedforward=new_dim_feedforward,
                       pos_dim=cfg.pos_dim or cfg.d_model)


def expand_decoder_width(dec_params: Dict, cfg, new_d_model: int,
                         new_dim_feedforward: int,
                         noise: float = 0.0,
                         seed: int = 0) -> Dict:
    """Widen the WHOLE FormulaDecoder: d_model + dim_feedforward across all
    layers, embeddings, memory builder, and output heads.

    Capability parity with the reference ``expand_enhanced_decoder``
    (reference: models/net2net_expansion.py:636-950).  The reference
    transfers component-by-component with noise and accepts approximate
    preservation; here the duplication map is chosen so that expansion is
    EXACTLY function-preserving (uniform per-head channel duplication
    keeps LayerNorm statistics, attention scores — q scaled by
    sqrt(dh'/dh), k/v divided by multiplicity — the positional table (via
    ``widened_config``'s pos_dim pin), and every consumer sum unchanged).

    ``new_d_model`` / ``new_dim_feedforward`` must be integer multiples of
    the old dims: uneven duplication would change LayerNorm statistics and
    destroy the function (measured: 0% argmax agreement at a 1.5x ratio),
    so non-integer ratios are rejected rather than silently corrupted.
    Set ``noise > 0`` to break the symmetry between duplicated units
    before further training (as the reference's noisy transfer does).

    Returns a new param pytree targeting
    ``widened_config(cfg, new_d_model, new_dim_feedforward)``.
    """
    d, ff, nhead = cfg.d_model, cfg.dim_feedforward, cfg.nhead
    assert new_d_model % nhead == 0
    if new_d_model % d or new_dim_feedforward % ff:
        raise ValueError(
            f'expand_decoder_width requires integer widening factors: '
            f'{d}->{new_d_model}, {ff}->{new_dim_feedforward}')
    dh, dh2 = d // nhead, new_d_model // nhead
    rng = np.random.default_rng(seed)

    def head_map(old_d, new_d, groups):
        from .decoder import head_dup_map
        m = head_dup_map(old_d, new_d, groups)
        counts = np.bincount(m, minlength=old_d)
        return m, counts[m].astype(np.float64)

    m, mult = head_map(d, new_d_model, nhead)       # residual-stream map
    mf, multf = head_map(ff, new_dim_feedforward, 1)

    def nz(shape):
        return (rng.normal(0, noise, shape) if noise > 0 else 0.0)

    def cols(k, mm):                                 # produce-to-stream
        out = _np(k)[..., mm]
        return out + nz(out.shape)

    def rows(k, mm, mm_mult):                        # consume-from-stream
        return _np(k)[mm] / mm_mult[:, None]

    def flat_cols(k, n_tokens):
        """[in, n_tokens*d] -> [in, n_tokens*new_d]: per-token channel map."""
        k = _np(k)
        k3 = k.reshape(k.shape[0], n_tokens, d)
        return k3[..., m].reshape(k.shape[0], n_tokens * new_d_model)

    def flat_bias(b, n_tokens):
        return _np(b).reshape(n_tokens, d)[:, m].reshape(-1)

    params = jax.tree.map(np.array, dec_params)
    root = params['params']
    scale = float(np.sqrt(dh2 / dh))

    # token embedding: produce-to-stream
    root['token_embedding']['embedding'] = cols(
        root['token_embedding']['embedding'], m)

    # memory builder
    mb = root['memory_builder']
    n_mem, n_st, n_hd = (cfg.n_memory_tokens, cfg.n_stoich_tokens,
                         cfg.n_heads_tokens)
    if 'latent_mid' in mb:      # direct path: mid width d*M//2 scales with d
        k1, b1, k2, _ = widen_dense_pair(
            mb['latent_mid']['kernel'], mb['latent_mid']['bias'],
            mb['latent_out']['kernel'],
            new_d_model * n_mem // 2, rng, noise=noise)
        mb['latent_mid']['kernel'], mb['latent_mid']['bias'] = k1, b1
        mb['latent_out']['kernel'] = flat_cols(k2, n_mem)
    else:
        mb['latent_out']['kernel'] = flat_cols(mb['latent_out']['kernel'],
                                               n_mem)
    mb['latent_out']['bias'] = flat_bias(mb['latent_out']['bias'], n_mem)
    # compact-order LN names: [bottleneck LN?] [stoich LN?] [heads LN?]
    ln_names = sorted((k for k in mb if k.startswith('LayerNorm')),
                      key=lambda s: int(s.split('_')[1]))
    ln_i = 1 if getattr(cfg, 'memory_bottleneck_dim', 0) > 0 else 0
    if n_st > 0:
        # stoich_mid -> LN -> stoich_out: map mid cols by m, divide consumer
        mb['stoich_mid']['kernel'] = cols(mb['stoich_mid']['kernel'], m)
        mb['stoich_mid']['bias'] = _np(mb['stoich_mid']['bias'])[m]
        lnk = ln_names[ln_i]
        ln_i += 1
        mb[lnk]['scale'] = _np(mb[lnk]['scale'])[m]
        mb[lnk]['bias'] = _np(mb[lnk]['bias'])[m]
        mb['stoich_out']['kernel'] = flat_cols(
            rows(mb['stoich_out']['kernel'], m, mult), n_st)
        mb['stoich_out']['bias'] = flat_bias(mb['stoich_out']['bias'], n_st)
    if n_hd > 0:
        # heads_mid1 -> LN -> gelu -> heads_mid2: uniform map keeps the LN
        # statistics exact (widen_dense_pair's random replication would not
        # commute with the LN between the pair)
        mh, multh = head_map(d // 2, new_d_model // 2, 1)
        mb['heads_mid1']['kernel'] = cols(mb['heads_mid1']['kernel'], mh)
        mb['heads_mid1']['bias'] = _np(mb['heads_mid1']['bias'])[mh]
        lnk = ln_names[ln_i]
        mb[lnk]['scale'] = _np(mb[lnk]['scale'])[mh]
        mb[lnk]['bias'] = _np(mb[lnk]['bias'])[mh]
        mb['heads_mid2']['kernel'] = cols(
            rows(mb['heads_mid2']['kernel'], mh, multh), m)
        mb['heads_mid2']['bias'] = _np(mb['heads_mid2']['bias'])[m]
        mb['heads_out']['kernel'] = flat_cols(
            rows(mb['heads_out']['kernel'], m, mult), n_hd)
        mb['heads_out']['bias'] = flat_bias(mb['heads_out']['bias'], n_hd)

    # decoder layers
    for name in [k for k in root if k.startswith('layer_')]:
        layer = root[name]
        for lnk in ('norm1', 'norm2', 'norm3'):
            layer[lnk]['scale'] = _np(layer[lnk]['scale'])[m]
            layer[lnk]['bias'] = _np(layer[lnk]['bias'])[m]
        for att in ('self', 'cross'):
            q = layer[f'{att}_q']
            q['kernel'] = cols(rows(q['kernel'], m, mult), m) * scale
            q['bias'] = _np(q['bias'])[m] * scale
            k_ = layer[f'{att}_k']
            k_['kernel'] = cols(rows(k_['kernel'], m, mult), m) / mult
            k_['bias'] = _np(k_['bias'])[m] / mult
            v = layer[f'{att}_v']
            v['kernel'] = cols(rows(v['kernel'], m, mult), m) / mult
            v['bias'] = _np(v['bias'])[m] / mult
            o = layer[f'{att}_o']
            o['kernel'] = cols(_np(o['kernel'])[m], m)   # rows NOT divided
            o['bias'] = _np(o['bias'])[m]
        layer['ff1']['kernel'] = cols(rows(layer['ff1']['kernel'], m, mult),
                                      mf)
        layer['ff1']['bias'] = _np(layer['ff1']['bias'])[mf]
        layer['ff2']['kernel'] = cols(rows(layer['ff2']['kernel'], mf, multf),
                                      m)
        layer['ff2']['bias'] = _np(layer['ff2']['bias'])[m]

    # output heads
    root['out_ln']['scale'] = _np(root['out_ln']['scale'])[m]
    root['out_ln']['bias'] = _np(root['out_ln']['bias'])[m]
    mo, multo = head_map(d, new_d_model, 1)
    root['out_d1']['kernel'] = cols(rows(root['out_d1']['kernel'], m, mult),
                                    mo)
    root['out_d1']['bias'] = _np(root['out_d1']['bias'])[mo]
    root['out_d2']['kernel'] = rows(root['out_d2']['kernel'], mo, multo)
    root['type_ln']['scale'] = _np(root['type_ln']['scale'])[m]
    root['type_ln']['bias'] = _np(root['type_ln']['bias'])[m]
    mt, multt = head_map(d, new_d_model, 1)
    root['type_d1']['kernel'] = cols(rows(root['type_d1']['kernel'], m, mult),
                                     mt)
    root['type_d1']['bias'] = _np(root['type_d1']['bias'])[mt]
    mq, multq = head_map(d // 4, new_d_model // 4, 1)
    root['type_d2']['kernel'] = cols(rows(root['type_d2']['kernel'], mt,
                                          multt), mq)
    root['type_d2']['bias'] = _np(root['type_d2']['bias'])[mq]
    root['type_d3']['kernel'] = rows(root['type_d3']['kernel'], mq, multq)
    for hd in ('stop', 'dup'):
        mh, multh = head_map(d // 4, new_d_model // 4, 1)
        root[f'{hd}_d1']['kernel'] = cols(
            rows(root[f'{hd}_d1']['kernel'], m, mult), mh)
        root[f'{hd}_d1']['bias'] = _np(root[f'{hd}_d1']['bias'])[mh]
        root[f'{hd}_d2']['kernel'] = rows(root[f'{hd}_d2']['kernel'], mh,
                                          multh)
    return params


# ---- whole-model encoder expansion -------------------------------------------

def widened_encoder_config(cfg, new_fusion_dim: int,
                           new_encoder_hidden, new_decoder_hidden):
    """ModelConfig targeted by ``expand_encoder_widths``."""
    import dataclasses as _dc
    return _dc.replace(cfg, fusion_dim=new_fusion_dim,
                       encoder_hidden=tuple(new_encoder_hidden),
                       decoder_hidden=tuple(new_decoder_hidden))


def expand_encoder_widths(enc_params: Dict, cfg, new_fusion_dim: int,
                          new_encoder_hidden, new_decoder_hidden,
                          noise: float = 0.0, seed: int = 0) -> Dict:
    """Widen the WHOLE MaterialsEncoder: fusion_dim + encoder/decoder
    hidden stacks, across all three encoder branches, the fusion MLP, the
    latent projection, the decoder backbone, and every head reading from
    it.  Heads reading from the (unchanged) latent are untouched.

    Capability parity with the reference ``expand_full_materials_vae``
    (reference: models/net2net_expansion.py:954-1368).  Like
    ``expand_decoder_width`` this uses uniform channel duplication so the
    expansion is EXACTLY function-preserving for every fixed-dim output
    (z, tc/sc/fraction/hp/family/tc_class/magpie predictions); the
    width-carrying ``attended_input`` output becomes its own channel
    duplication.  Integer widening factors only.

    Returns a new param pytree targeting ``widened_encoder_config``.
    """
    f = cfg.fusion_dim
    eh, dh = tuple(cfg.encoder_hidden), tuple(cfg.decoder_hidden)
    neh, ndh = tuple(new_encoder_hidden), tuple(new_decoder_hidden)
    if (new_fusion_dim % f or len(neh) != len(eh) or len(ndh) != len(dh)
            or any(n % o for n, o in zip(neh, eh))
            or any(n % o for n, o in zip(ndh, dh))):
        raise ValueError(
            f'expand_encoder_widths requires integer widening factors and '
            f'equal stack depths: fusion {f}->{new_fusion_dim}, '
            f'encoder_hidden {eh}->{neh}, decoder_hidden {dh}->{ndh}')
    rng = np.random.default_rng(seed)

    def umap(old, new):
        m = np.sort(np.tile(np.arange(old), new // old))
        counts = np.bincount(m, minlength=old)
        return m, counts[m].astype(np.float64)

    def nz(shape):
        return (rng.normal(0, noise, shape) if noise > 0 else 0.0)

    def cols(k, m):                                  # produce-to-widened
        out = _np(k)[..., m]
        return out + nz(out.shape)

    def rows(k, m, mult):                            # consume-from-widened
        return _np(k)[m] / mult[:, None]

    def map_ln(ln, m):
        ln['scale'] = _np(ln['scale'])[m]
        ln['bias'] = _np(ln['bias'])[m]

    def map_out(mod, m):                             # Dense producing widened
        mod['kernel'] = cols(mod['kernel'], m)
        mod['bias'] = _np(mod['bias'])[m]

    mf, multf = umap(f, new_fusion_dim)

    params = jax.tree.map(np.array, enc_params)
    root = params['params']

    # element branch: output_projection MLP([fusion]) with LN
    op = root['element_encoder']['output_projection']
    map_out(op['Dense_0'], mf)
    map_ln(op['LayerNorm_0'], mf)

    # magpie branch: MLP([2f, f]) with LN on both layers
    m2f, mult2f = umap(2 * f, 2 * new_fusion_dim)
    me = root['magpie_encoder']
    map_out(me['Dense_0'], m2f)
    map_ln(me['LayerNorm_0'], m2f)
    me['Dense_1']['kernel'] = cols(rows(me['Dense_1']['kernel'], m2f, mult2f),
                                   mf)
    me['Dense_1']['bias'] = _np(me['Dense_1']['bias'])[mf]
    map_ln(me['LayerNorm_1'], mf)

    # tc branch: MLP([f/2, f]) no LN, then tc_encoder_ln
    mfh, multfh = umap(f // 2, new_fusion_dim // 2)
    te = root['tc_encoder_pre']
    map_out(te['Dense_0'], mfh)
    te['Dense_1']['kernel'] = cols(rows(te['Dense_1']['kernel'], mfh, multfh),
                                   mf)
    te['Dense_1']['bias'] = _np(te['Dense_1']['bias'])[mf]
    map_ln(root['tc_encoder_ln'], mf)

    # fusion MLP([3f]): input is concat [elem f | magpie f | tc f] — the
    # consume map must be segment-blocked; the 3f output is internal, so a
    # plain uniform map serves as its duplication
    m3f_in = np.concatenate([mf + i * f for i in range(3)])
    mult3f_in = np.concatenate([multf] * 3)
    m3f, mult3f = umap(3 * f, 3 * new_fusion_dim)
    fu = root['fusion']['Dense_0']
    fu['kernel'] = cols(rows(fu['kernel'], m3f_in, mult3f_in), m3f)
    fu['bias'] = _np(fu['bias'])[m3f]
    map_ln(root['fusion']['LayerNorm_0'], m3f)

    # latent stack: MLP(encoder_hidden) with LN per layer, then fc_mean
    prev_m, prev_mult = m3f, mult3f
    lm = root['latent_mlp']
    for i, (old_w, new_w) in enumerate(zip(eh, neh)):
        mh, multh = umap(old_w, new_w)
        lm[f'Dense_{i}']['kernel'] = cols(
            rows(lm[f'Dense_{i}']['kernel'], prev_m, prev_mult), mh)
        lm[f'Dense_{i}']['bias'] = _np(lm[f'Dense_{i}']['bias'])[mh]
        map_ln(lm[f'LayerNorm_{i}'], mh)
        prev_m, prev_mult = mh, multh
    root['fc_mean']['kernel'] = rows(root['fc_mean']['kernel'],
                                     prev_m, prev_mult)

    # decoder backbone: MLP(decoder_hidden) consuming the unchanged latent
    bb = root['decoder_backbone']
    prev = None
    for i, (old_w, new_w) in enumerate(zip(dh, ndh)):
        mh, multh = umap(old_w, new_w)
        k = bb[f'Dense_{i}']['kernel']
        bb[f'Dense_{i}']['kernel'] = cols(
            k if prev is None else rows(k, prev[0], prev[1]), mh)
        bb[f'Dense_{i}']['bias'] = _np(bb[f'Dense_{i}']['bias'])[mh]
        map_ln(bb[f'LayerNorm_{i}'], mh)
        prev = (mh, multh)
    mb, multb = prev                                  # backbone output map

    # heads consuming backbone_h
    root['tc_proj']['kernel'] = rows(root['tc_proj']['kernel'], mb, multb)
    mg = root['magpie_head']                         # MLP([backbone, magpie])
    mgh, multgh = umap(dh[-1], ndh[-1])
    mg['Dense_0']['kernel'] = cols(rows(mg['Dense_0']['kernel'], mb, multb),
                                   mgh)
    mg['Dense_0']['bias'] = _np(mg['Dense_0']['bias'])[mgh]
    mg['Dense_1']['kernel'] = rows(mg['Dense_1']['kernel'], mgh, multgh)
    ah = root['attended_head']                       # [backbone -> fusion]
    ah['kernel'] = cols(rows(ah['kernel'], mb, multb), mf)
    ah['bias'] = _np(ah['bias'])[mf]
    map_ln(root['attended_head_ln'], mf)
    tch = root['tc_class_head']
    tch['Dense_0']['kernel'] = rows(tch['Dense_0']['kernel'], mb, multb)
    # family head: input layout [backbone | sc_logit(1)]
    mb_sc = np.concatenate([mb, [dh[-1]]])
    multb_sc = np.concatenate([multb, [1.0]])
    fh = root['family_head']
    for head in ('coarse', 'cuprate_sub', 'iron_sub'):
        fh[f'{head}_d0']['kernel'] = rows(fh[f'{head}_d0']['kernel'],
                                          mb_sc, multb_sc)
    return params
