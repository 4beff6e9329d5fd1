"""Grouped-feature attention encoders — contrastive-era legacy components.

Flax port of the reference's feature_groups module (reference:
encoders/feature_groups.py:99-494): per-group projections + cross-group
multi-head attention (GroupedFeatureEncoder), learnable-query expert
attention over groups (ExpertAttentionHead / AttentiveExpert), and the
InfoNCE-style ContrastiveFeatureEncoder.  The reference's ACTIVE path
(FullMaterialsVAE) does not use these — they are the V1-era contrastive
experiments — ported for capability parity.

TPU notes: groups are a static dict of [B, dim] arrays; a missing
optional group contributes a zero row (same semantics as the reference's
zeros fill, feature_groups.py:183-188) — the group set is part of the
trace, so each group combination compiles once.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ['DEFAULT_GROUP_DIMS', 'EXTENDED_GROUP_DIMS',
           'GroupedFeatureEncoder', 'ExpertAttentionHead',
           'AttentiveExpert', 'ContrastiveFeatureEncoder']

# reference: feature_groups.py:481-494
DEFAULT_GROUP_DIMS = {'composition': 118, 'element_stats': 22}
EXTENDED_GROUP_DIMS = {'composition': 118, 'element_stats': 22,
                       'structure': 12, 'electronic': 8,
                       'thermodynamic': 4, 'experimental': 6}

_gelu = nn.gelu


class GroupedFeatureEncoder(nn.Module):
    """Cross-group attention over semantically grouped features
    (reference: feature_groups.py:99-209).

    Each group projects to ``hidden_dim``; groups stack to [B, G, H];
    one MHA layer learns group interactions; residual+LN; flatten+MLP.
    """
    group_dims: Dict[str, int]
    hidden_dim: int = 128
    n_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, groups: Dict[str, Optional[jnp.ndarray]], *,
                 deterministic: bool = True,
                 return_attention: bool = False):
        names = list(self.group_dims)
        b = next(v.shape[0] for v in groups.values() if v is not None)
        encoded = []
        for name in names:
            g = groups.get(name)
            if g is None:
                encoded.append(jnp.zeros((b, self.hidden_dim)))
                continue
            h = nn.Dense(self.hidden_dim, name=f'enc_{name}')(g)
            h = nn.LayerNorm(name=f'ln_{name}')(h)
            h = nn.Dropout(self.dropout)(_gelu(h),
                                         deterministic=deterministic)
            encoded.append(h)
        x = jnp.stack(encoded, axis=1)                     # [B, G, H]

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout,
            name='cross_attention')
        attended = attn(x, x, deterministic=deterministic)
        attended = nn.LayerNorm(name='attention_norm')(attended + x)

        flat = attended.reshape(b, -1)
        y = _gelu(nn.Dense(self.hidden_dim * 2, name='out1')(flat))
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        out = nn.Dense(self.hidden_dim, name='out2')(y)
        if return_attention:
            # per-head mean attention map for interpretability
            q = k = attended
            w = jnp.einsum('bgh,bkh->bgk', q, k) / jnp.sqrt(self.hidden_dim)
            return out, jax.nn.softmax(w, axis=-1)
        return out


class ExpertAttentionHead(nn.Module):
    """Learnable-query soft attention over feature groups — which groups
    this expert reads (reference: feature_groups.py:211-267)."""
    hidden_dim: int
    temperature: float = 1.0

    @nn.compact
    def __call__(self, group_embeddings: jnp.ndarray) -> jnp.ndarray:
        query = self.param('query', nn.initializers.normal(1.0),
                           (self.hidden_dim,))
        keys = nn.Dense(self.hidden_dim, name='key_proj')(group_embeddings)
        scores = keys @ query / self.temperature     # [..., G]
        return jax.nn.softmax(scores, axis=-1)


class AttentiveExpert(nn.Module):
    """Expert MLP over its attention-weighted group mixture
    (reference: feature_groups.py:269-336)."""
    hidden_dim: int
    output_dim: int = 1
    temperature: float = 1.0

    @nn.compact
    def __call__(self, group_embeddings: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = ExpertAttentionHead(self.hidden_dim, self.temperature,
                                name='attention')(group_embeddings)
        mixed = jnp.einsum('bg,bgh->bh', w, group_embeddings)
        h = _gelu(nn.Dense(self.hidden_dim, name='fc1')(mixed))
        out = nn.Dense(self.output_dim, name='fc2')(h)
        return out, w


class ContrastiveFeatureEncoder(nn.Module):
    """MLP encoder + projection head for SC/non-SC contrastive learning
    (reference: feature_groups.py:338-478)."""
    input_dim: int
    latent_dim: int = 64
    hidden_dims: Sequence[int] = (256, 128)
    temperature: float = 0.07
    dropout: float = 0.1

    def setup(self):
        self.enc_layers = [nn.Dense(h, name=f'enc_{i}')
                           for i, h in enumerate(self.hidden_dims)]
        self.enc_norms = [nn.LayerNorm(name=f'enc_ln_{i}')
                          for i in range(len(self.hidden_dims))]
        self.enc_out = nn.Dense(self.latent_dim, name='enc_out')
        self.proj1 = nn.Dense(self.latent_dim, name='proj1')
        self.proj2 = nn.Dense(self.latent_dim, name='proj2')
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, *, deterministic: bool = True) -> jnp.ndarray:
        for dense, norm in zip(self.enc_layers, self.enc_norms):
            x = self.drop(_gelu(norm(dense(x))),
                          deterministic=deterministic)
        return self.enc_out(x)

    def encode_project(self, x, *, deterministic: bool = True):
        """(z, normalized projection) in one pass — ALSO the init surface:
        ``init(rng, x, method=ContrastiveFeatureEncoder.encode_project)``
        creates encoder AND projection-head params (setup-style modules
        only materialize params their init path touches)."""
        z = self(x, deterministic=deterministic)
        return z, self.project(z)

    def project(self, z: jnp.ndarray) -> jnp.ndarray:
        p = self.proj2(_gelu(self.proj1(z)))
        return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True),
                               1e-12)

    def contrastive_loss(self, z_sc: jnp.ndarray,
                         z_neg: jnp.ndarray) -> jnp.ndarray:
        """Push each SC row's best SC neighbor above all negatives:
        loss = mean(-max_pos_sim + logsumexp(neg_sims))
        (reference: feature_groups.py:404-478; its tc_values argument
        computes weights that the reference never applies, so the Tc
        path is not reproduced)."""
        p_sc = self.project(z_sc)
        p_neg = self.project(z_neg)
        sim_ss = p_sc @ p_sc.T / self.temperature      # [S, S]
        sim_sn = p_sc @ p_neg.T / self.temperature     # [S, N]
        eye = jnp.eye(p_sc.shape[0], dtype=bool)
        max_pos = jnp.max(jnp.where(eye, -jnp.inf, sim_ss), axis=1)
        neg_lse = jax.nn.logsumexp(sim_sn, axis=1)
        return jnp.mean(-max_pos + neg_lse)
