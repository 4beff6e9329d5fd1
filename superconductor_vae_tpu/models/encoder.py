"""Multi-task materials encoder (`FullMaterialsVAE` capability, Flax).

Three input branches — stoichiometry-weighted element attention, Magpie-feature
MLP, Tc embedding — fuse into a deterministic 2048-dim latent ``z``, decoded by
a shared backbone into 9+ prediction heads (Tc residual head, Magpie, attended
conditioning, competence, fractions+count, high-pressure, Tc bucket,
cross-head SC classifier, 3-level hierarchical family).

Capability parity with the reference encoder
(reference: src/superconductor/models/attention_vae.py:314-822), redesigned
for TPU/XLA:

- The whole forward is a single jittable function of fixed-shape arrays; all
  head outputs are returned in one dict so one ``jax.value_and_grad`` covers
  the full multi-task loss.
- Element featurization is embedding-gather + one masked single-query
  attention (a [B, 12, D] x [D] contraction — tiny; XLA fuses it), weighted by
  molar fractions before attention exactly as the reference does
  (attention_vae.py:115-121).
- The cross-head SC classifier input concatenation preserves the reference's
  ordering (attention_vae.py:756-766): [z, tc, magpie, hp, fractions, count,
  competence, tc_class] — checkpoint conversion depends on it.
- ``kl_loss`` is L2(z²) in deterministic mode, key name kept for parity with
  the reference's intentional reuse (attention_vae.py:772-786).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import ModelConfig

_dense_init = nn.initializers.xavier_uniform()

# Parity with the torch reference: exact (erf) GELU and LayerNorm eps=1e-5
# (torch defaults; flax defaults differ: tanh-approx GELU, eps=1e-6).
import functools as _functools
_gelu = _functools.partial(nn.gelu, approximate=False)
_LN = _functools.partial(nn.LayerNorm, epsilon=1e-5)



class MLP(nn.Module):
    """[Dense -> LayerNorm? -> GELU -> Dropout?] stack used across branches."""
    features: Sequence[int]
    use_layernorm: bool = True
    dropout: float = 0.0
    final_activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=_dense_init, dtype=self.dtype)(x)
            last = i == n - 1
            if not last or self.final_activation:
                if self.use_layernorm:
                    x = _LN(dtype=self.dtype)(x)
                x = _gelu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ElementAttention(nn.Module):
    """Learnable-query multi-head attention over element slots.

    A single learned query ("what matters for superconductivity") attends over
    the ≤12 element embeddings; returns the pooled representation and averaged
    per-element attention weights for interpretability
    (reference: encoders/element_attention.py:101-214).
    """
    hidden_dim: int
    n_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeds, mask, *, deterministic: bool = True):
        b, n, _ = embeds.shape
        hd = self.hidden_dim // self.n_heads
        query = self.param('query', nn.initializers.xavier_uniform(),
                           (self.n_heads, hd))
        keys = nn.Dense(self.hidden_dim, kernel_init=_dense_init,
                        dtype=self.dtype, name='key_proj')(embeds)
        values = nn.Dense(self.hidden_dim, kernel_init=_dense_init,
                          dtype=self.dtype, name='value_proj')(embeds)
        keys = keys.reshape(b, n, self.n_heads, hd)
        values = values.reshape(b, n, self.n_heads, hd)

        # scores: [B, heads, n]
        scores = jnp.einsum('hd,bnhd->bhn', query.astype(self.dtype), keys)
        scores = scores / jnp.sqrt(jnp.asarray(hd, self.dtype))
        scores = jnp.where(mask[:, None, :], scores, jnp.finfo(self.dtype).min)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        attended = jnp.einsum('bhn,bnhd->bhd', attn, values)
        attended = attended.reshape(b, self.hidden_dim)
        out = nn.Dense(self.hidden_dim, kernel_init=_dense_init,
                       dtype=self.dtype, name='output_proj')(attended)
        out = _LN(dtype=self.dtype)(out)
        return out, attn.mean(axis=1)  # [B, hidden], [B, n]


class ElementEncoder(nn.Module):
    """Learnable element embeddings, fraction-weighted, attention-pooled."""
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, element_indices, element_fractions, element_mask, *,
                 deterministic: bool = True):
        cfg = self.cfg
        embed = nn.Embed(cfg.n_elements + 1, cfg.element_embed_dim,
                         embedding_init=nn.initializers.normal(0.02),
                         dtype=self.dtype, name='element_embed')
        embeds = embed(element_indices)  # [B, 12, E]
        # Stoichiometry weighting BEFORE attention — Cu3 contributes 3x Y1
        embeds = embeds * element_fractions[..., None].astype(self.dtype)
        attended, attn_w = ElementAttention(
            hidden_dim=cfg.element_embed_dim, n_heads=cfg.n_attention_heads,
            dropout=cfg.dropout, dtype=self.dtype, name='element_attention',
        )(embeds, element_mask.astype(bool), deterministic=deterministic)
        out = MLP([cfg.fusion_dim], dropout=cfg.dropout, dtype=self.dtype,
                  name='output_projection')(attended, deterministic=deterministic)
        return out, attn_w, embeds


class HierarchicalFamilyHead(nn.Module):
    """3-level family tree conditioned on detached P(SC).

    Composes 14-class probabilities: NOT_SC, BCS, 6 cuprate subs, 2 iron subs,
    MgB2, heavy-fermion, organic, other
    (reference: attention_vae.py:175-307).
    """
    backbone_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, sc_logit_detached, *, deterministic: bool = True):
        sc_prob = jax.nn.sigmoid(sc_logit_detached)[:, None].astype(self.dtype)
        x = jnp.concatenate([h, sc_prob], axis=-1)

        def head(name, widths, out):
            y = x
            for i, w in enumerate(widths):
                y = nn.Dense(w, kernel_init=_dense_init, dtype=self.dtype,
                             name=f'{name}_d{i}')(y)
                if i == 0:
                    y = _LN(dtype=self.dtype, name=f'{name}_ln')(y)
                y = _gelu(y)
                if i == 0:
                    y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            return nn.Dense(out, kernel_init=_dense_init, dtype=self.dtype,
                            name=f'{name}_out')(y)

        coarse = head('coarse', (256, 128), 7)          # 7 coarse SC families
        cuprate = head('cuprate_sub', (128, 64), 6)     # 6 cuprate subs
        iron = head('iron_sub', (64,), 2)               # 2 iron subs

        cp = jax.nn.softmax(coarse, axis=-1)
        cup = jax.nn.softmax(cuprate, axis=-1)
        irp = jax.nn.softmax(iron, axis=-1)
        p_sc = sc_prob[:, 0]

        composed = jnp.concatenate([
            (1.0 - p_sc)[:, None],                       # 0 NOT_SC
            (p_sc * cp[:, 0])[:, None],                  # 1 BCS
            (p_sc * cp[:, 1])[:, None] * cup,            # 2-7 cuprates
            (p_sc * cp[:, 2])[:, None] * irp,            # 8-9 iron
            (p_sc * cp[:, 3])[:, None],                  # 10 MgB2
            (p_sc * cp[:, 4])[:, None],                  # 11 heavy fermion
            (p_sc * cp[:, 5])[:, None],                  # 12 organic
            (p_sc * cp[:, 6])[:, None],                  # 13 other
        ], axis=-1)
        return {
            'coarse_logits': coarse,
            'cuprate_sub_logits': cuprate,
            'iron_sub_logits': iron,
            'composed_14': composed,
        }


class MaterialsEncoder(nn.Module):
    """Three-branch encoder -> deterministic z -> multi-head decode."""
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        d = self.dtype
        self.element_encoder = ElementEncoder(cfg, dtype=d)
        self.magpie_encoder = MLP(
            [cfg.fusion_dim * 2, cfg.fusion_dim], dropout=cfg.dropout,
            dtype=d, name='magpie_encoder')
        # topology matches reference tc_encoder (attention_vae.py:396-402):
        # Dense -> GELU -> Dense -> LN -> GELU
        self.tc_encoder = MLP(
            [cfg.fusion_dim // 2, cfg.fusion_dim], use_layernorm=False,
            final_activation=False, dtype=d, name='tc_encoder_pre')
        self.tc_encoder_ln = _LN(dtype=d)
        self.fusion = MLP([cfg.fusion_dim * 3], dropout=cfg.dropout, dtype=d)
        self.latent_mlp = MLP(list(cfg.encoder_hidden), dtype=d)
        self.fc_mean = nn.Dense(cfg.latent_dim, kernel_init=_dense_init, dtype=d)

        self.decoder_backbone = MLP(
            list(cfg.decoder_hidden), dropout=cfg.dropout, dtype=d)
        backbone_dim = cfg.decoder_hidden[-1]

        # Tc residual head (reference: attention_vae.py:446-466)
        self.tc_proj = nn.Dense(256, kernel_init=_dense_init, dtype=d)
        self.tc_res_block = MLP([256, 256], dropout=cfg.dropout,
                                final_activation=False, dtype=d)
        self.tc_out_ln = _LN(dtype=d)
        self.tc_out_1 = nn.Dense(128, kernel_init=_dense_init, dtype=d)
        self.tc_out_2 = nn.Dense(1, kernel_init=_dense_init, dtype=d)

        self.magpie_head = MLP([backbone_dim, cfg.magpie_dim],
                               use_layernorm=False, final_activation=False, dtype=d)
        self.attended_head = nn.Dense(cfg.fusion_dim, kernel_init=_dense_init, dtype=d)
        self.attended_head_ln = _LN(dtype=d)
        self.competence_head = MLP([cfg.latent_dim // 4, 1],
                                   use_layernorm=False, final_activation=False, dtype=d)
        # fraction head topology (attention_vae.py:507-515):
        # Dense -> LN -> GELU -> Dropout -> Dense -> GELU -> Dense
        self.fraction_d0 = nn.Dense(256, kernel_init=_dense_init, dtype=d)
        self.fraction_ln = _LN(dtype=d)
        self.fraction_d1 = nn.Dense(128, kernel_init=_dense_init, dtype=d)
        self.fraction_d2 = nn.Dense(cfg.max_elements + 1,
                                    kernel_init=_dense_init, dtype=d)
        # hp head uses ReLU (attention_vae.py:548-552)
        self.hp_d0 = nn.Dense(256, kernel_init=_dense_init, dtype=d)
        self.hp_d1 = nn.Dense(1, kernel_init=_dense_init, dtype=d)
        self.tc_class_head = MLP([256, 5], use_layernorm=False,
                                 final_activation=False, dropout=cfg.dropout, dtype=d)
        if cfg.use_numden_head:
            self.numden_head = MLP([512, 256, 24], final_activation=False,
                                   dropout=cfg.dropout, dtype=d)
        # sc head topology (attention_vae.py:586-594):
        # Dense -> GELU -> LN -> Dropout -> Dense -> GELU -> Dense
        self.sc_d0 = nn.Dense(512, kernel_init=_dense_init, dtype=d)
        self.sc_ln = _LN(dtype=d)
        self.sc_d1 = nn.Dense(128, kernel_init=_dense_init, dtype=d)
        self.sc_d2 = nn.Dense(1, kernel_init=_dense_init, dtype=d)
        self.head_drop = nn.Dropout(cfg.dropout)
        self.family_head = HierarchicalFamilyHead(
            backbone_dim=backbone_dim, dropout=cfg.dropout, dtype=d)

    def encode(self, element_indices, element_fractions, element_mask,
               magpie, tc, *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        tc = tc.reshape(tc.shape[0], 1).astype(self.dtype)
        elem_repr, attn_w, elem_embeds = self.element_encoder(
            element_indices, element_fractions, element_mask,
            deterministic=deterministic)
        magpie_repr = self.magpie_encoder(magpie.astype(self.dtype),
                                          deterministic=deterministic)
        tc_repr = _gelu(self.tc_encoder_ln(
            self.tc_encoder(tc, deterministic=deterministic)))
        fused = jnp.concatenate([elem_repr, magpie_repr, tc_repr], axis=-1)
        fused = self.fusion(fused, deterministic=deterministic)
        h = self.latent_mlp(fused, deterministic=deterministic)
        z = self.fc_mean(h)
        return {
            'z': z, 'z_mean': z,
            'attention_weights': attn_w,
            'element_embeddings': elem_embeds,
            'fused_repr': fused,
        }

    def fraction_heads(self, z, *, deterministic: bool = True) -> jnp.ndarray:
        h = self.head_drop(_gelu(self.fraction_ln(self.fraction_d0(z))),
                           deterministic=deterministic)
        return self.fraction_d2(_gelu(self.fraction_d1(h)))

    def decode(self, z, *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        h = self.decoder_backbone(z.astype(self.dtype),
                                  deterministic=deterministic)
        tc_h = self.tc_proj(h)
        tc_h = tc_h + self.tc_res_block(tc_h, deterministic=deterministic)
        tc_pred = self.tc_out_2(
            _gelu(self.tc_out_1(_gelu(self.tc_out_ln(tc_h)))))[:, 0]
        return {
            'tc_pred': tc_pred,
            'magpie_pred': self.magpie_head(h, deterministic=deterministic),
            'attended_input': self.attended_head_ln(self.attended_head(h)),
            'tc_class_logits': self.tc_class_head(h, deterministic=deterministic),
            'backbone_h': h,
        }

    def __call__(self, element_indices, element_fractions, element_mask,
                 magpie, tc, *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        enc = self.encode(element_indices, element_fractions, element_mask,
                          magpie, tc, deterministic=deterministic)
        z = enc['z']
        dec = self.decode(z, deterministic=deterministic)

        competence = jax.nn.sigmoid(
            self.competence_head(z, deterministic=deterministic)[:, 0])
        frac_out = self.fraction_heads(z, deterministic=deterministic)
        fraction_pred = frac_out[:, :cfg.max_elements]
        element_count_pred = frac_out[:, -1]
        hp_pred = self.hp_d1(jax.nn.relu(self.hp_d0(z)))[:, 0]
        numden_pred = (self.numden_head(z, deterministic=deterministic)
                       if cfg.use_numden_head else None)
        tc_class_logits = dec['tc_class_logits']

        # Cross-head SC classifier: ordering matters for checkpoint parity
        sc_input = jnp.concatenate([
            z,
            dec['tc_pred'][:, None],
            dec['magpie_pred'],
            hp_pred[:, None],
            fraction_pred,
            element_count_pred[:, None],
            competence[:, None],
            tc_class_logits,
        ], axis=-1)
        h_sc = self.head_drop(self.sc_ln(_gelu(self.sc_d0(sc_input))),
                              deterministic=deterministic)
        sc_pred = self.sc_d2(_gelu(self.sc_d1(h_sc)))[:, 0]

        family = self.family_head(
            dec['backbone_h'], jax.lax.stop_gradient(sc_pred),
            deterministic=deterministic)

        z_reg = jnp.mean(jnp.square(z))  # L2 reg; key named kl_loss for parity

        return {
            'z': z, 'z_mean': z, 'kl_loss': z_reg,
            'attention_weights': enc['attention_weights'],
            'element_embeddings': enc['element_embeddings'],
            'tc_pred': dec['tc_pred'],
            'magpie_pred': dec['magpie_pred'],
            'attended_input': dec['attended_input'],
            'competence': competence,
            'fraction_pred': fraction_pred,
            'element_count_pred': element_count_pred,
            'numden_pred': numden_pred,
            'hp_pred': hp_pred,
            'sc_pred': sc_pred,
            'tc_class_logits': tc_class_logits,
            'family_coarse_logits': family['coarse_logits'],
            'family_cuprate_sub_logits': family['cuprate_sub_logits'],
            'family_iron_sub_logits': family['iron_sub_logits'],
            'family_composed_14': family['composed_14'],
        }

    def heads_from_z(self, z, *, deterministic: bool = True
                     ) -> Dict[str, jnp.ndarray]:
        """All encoder heads assembled from z alone (the inference path: no
        input features exist for a sampled latent).  Reproduces ``__call__``'s
        head assembly minus ``encode`` — used by the discovery pipeline and
        by Phase-2 self-supervised losses, where gradients must flow through
        the head weights (reference: self_supervised.py:1124-1195
        _compute_consistency_loss re-runs sc_head/fraction_head on z).

        Returns the per-head dict plus the assembled ``heads_vec`` /
        ``stoich`` conditioning for the decoder.
        """
        cfg = self.cfg
        dec = self.decode(z, deterministic=deterministic)
        competence = jax.nn.sigmoid(
            self.competence_head(z, deterministic=deterministic)[:, 0])
        frac_out = self.fraction_heads(z, deterministic=deterministic)
        fraction_pred = frac_out[:, :cfg.max_elements]
        element_count_pred = frac_out[:, -1]
        hp_pred = self.hp_d1(jax.nn.relu(self.hp_d0(z)))[:, 0]
        tc_class_logits = dec['tc_class_logits']
        sc_input = jnp.concatenate([
            z,
            dec['tc_pred'][:, None],
            dec['magpie_pred'],
            hp_pred[:, None],
            fraction_pred,
            element_count_pred[:, None],
            competence[:, None],
            tc_class_logits,
        ], axis=-1)
        h_sc = self.head_drop(self.sc_ln(_gelu(self.sc_d0(sc_input))),
                              deterministic=deterministic)
        sc_pred = self.sc_d2(_gelu(self.sc_d1(h_sc)))[:, 0]
        family = self.family_head(
            dec['backbone_h'], jax.lax.stop_gradient(sc_pred),
            deterministic=deterministic)
        out = {
            'tc_pred': dec['tc_pred'],
            'magpie_pred': dec['magpie_pred'],
            'tc_class_logits': tc_class_logits,
            'competence': competence,
            'fraction_pred': fraction_pred,
            'element_count_pred': element_count_pred,
            'hp_pred': hp_pred,
            'sc_pred': sc_pred,
            'family_composed_14': family['composed_14'],
        }
        out['heads_vec'] = self.heads_pred_for_decoder(out)
        out['stoich'] = jnp.concatenate(
            [fraction_pred, element_count_pred[:, None]], axis=1)
        return out

    def heads_pred_for_decoder(self, out: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Assemble the 24-dim heads-conditioning vector for decoder memory.

        Layout (reference: autoregressive_decoder.py:845-858):
        [tc(1), sc(1), hp(1), tc_class(5), competence(1), count(1), family(14)]
        """
        return jnp.concatenate([
            out['tc_pred'][:, None],
            out['sc_pred'][:, None],
            out['hp_pred'][:, None],
            out['tc_class_logits'],
            out['competence'][:, None],
            out['element_count_pred'][:, None],
            out['family_composed_14'],
        ], axis=-1)


def predict_tc_mc(encoder: 'MaterialsEncoder', params, z: jnp.ndarray,
                  rng, n_samples: int = 10
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MC-dropout Tc refinement + uncertainty from latent z.

    Capability parity with the reference ``predict_tc_mc``
    (reference: models/attention_vae.py:824-856): N stochastic decode
    passes with dropout active give a refined mean prediction and a
    per-sample std as an uncertainty estimate.

    TPU redesign: the reference loops N forwards in Python under
    ``torch.no_grad``; here the N dropout draws are ONE vmapped jitted
    call — the [N, B] pass batches onto the MXU.

    Returns (tc_mean [B], tc_std [B]) in normalized Tc units.
    """
    keys = jax.random.split(rng, n_samples)

    def one(key):
        out = encoder.apply(params, z, deterministic=False,
                            method=MaterialsEncoder.decode,
                            rngs={'dropout': key})
        return out['tc_pred']

    preds = jax.vmap(one)(keys)                               # [N, B]
    # unbiased std, matching torch.std's default
    return preds.mean(axis=0), preds.std(axis=0, ddof=1)
