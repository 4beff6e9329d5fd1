"""Legacy model families, kept for capability parity.

Compact Flax equivalents of the reference's retained legacy architectures:

- ``BidirectionalVAE`` (reference: src/superconductor/models/
  bidirectional_vae.py:285-695): the V1-era Magpie-feature VAE — stochastic
  encoder with reparameterization, feature decoder, Tc predictor, competence
  head, and its own ELBO-style loss.
- ``PointerGeneratorDecoder`` (reference: src/superconductor/models/
  pointer_generator_decoder.py:61-504): copy-vs-generate decoding with copy
  attention over the input element tokens and a learned generate-vs-copy
  gate.

Both are functional and tested, but not wired into the main training path —
exactly the reference's status for them.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import mha_attention

_init = nn.initializers.xavier_uniform()
_gelu = functools.partial(nn.gelu, approximate=False)


class BidirectionalVAE(nn.Module):
    """Magpie-feature VAE with Tc prediction and competence heads."""
    feature_dim: int = 145
    hidden_dims: Tuple[int, ...] = (256, 128)
    latent_dim: int = 64
    dropout: float = 0.1

    def setup(self):
        self.enc_layers = [nn.Dense(h, kernel_init=_init,
                                    name=f'enc_{i}')
                           for i, h in enumerate(self.hidden_dims)]
        self.fc_mean = nn.Dense(self.latent_dim, kernel_init=_init)
        self.fc_logvar = nn.Dense(self.latent_dim, kernel_init=_init)
        dec_dims = tuple(reversed(self.hidden_dims)) + (self.feature_dim,)
        self.dec_layers = [nn.Dense(h, kernel_init=_init, name=f'dec_{i}')
                           for i, h in enumerate(dec_dims)]
        self.tc_head = [nn.Dense(64, kernel_init=_init),
                        nn.Dense(1, kernel_init=_init)]
        self.competence_head = [nn.Dense(32, kernel_init=_init),
                                nn.Dense(1, kernel_init=_init)]

    def encode(self, x):
        h = x
        for layer in self.enc_layers:
            h = _gelu(layer(h))
        return self.fc_mean(h), self.fc_logvar(h)

    def decode(self, z):
        h = z
        for layer in self.dec_layers[:-1]:
            h = _gelu(layer(h))
        return self.dec_layers[-1](h)

    def __call__(self, x, rng: Optional[jax.Array] = None,
                 sample: bool = True) -> Dict[str, jnp.ndarray]:
        mean, logvar = self.encode(x)
        if sample and rng is not None:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        recon = self.decode(z)
        tc = self.tc_head[1](_gelu(self.tc_head[0](z)))[:, 0]
        comp = jax.nn.sigmoid(
            self.competence_head[1](_gelu(self.competence_head[0](z)))[:, 0])
        return {'recon': recon, 'z': z, 'z_mean': mean, 'z_logvar': logvar,
                'tc_pred': tc, 'competence': comp}

    @staticmethod
    def loss(out: Dict[str, jnp.ndarray], x: jnp.ndarray,
             tc_true: jnp.ndarray, beta: float = 1e-3,
             tc_weight: float = 1.0) -> Dict[str, jnp.ndarray]:
        recon = ((out['recon'] - x) ** 2).mean()
        kl = -0.5 * jnp.mean(
            1 + out['z_logvar'] - out['z_mean'] ** 2
            - jnp.exp(out['z_logvar']))
        tc = ((out['tc_pred'] - tc_true) ** 2).mean()
        total = recon + beta * kl + tc_weight * tc
        return {'total': total, 'recon': recon, 'kl': kl, 'tc': tc}


class PointerGeneratorDecoder(nn.Module):
    """Copy-vs-generate decoder: vocab distribution blended with a copy
    distribution over the input element tokens via a learned gate."""
    vocab_size: int
    d_model: int = 128
    nhead: int = 4
    max_src: int = 12

    @nn.compact
    def __call__(self, src_tokens, src_mask, tgt_tokens
                 ) -> Dict[str, jnp.ndarray]:
        """src_tokens [B, S] (element token ids), tgt_tokens [B, T] teacher
        inputs. Returns mixture log-probs [B, T, V]."""
        b, s = src_tokens.shape
        t = tgt_tokens.shape[1]
        d, h = self.d_model, self.nhead
        hd = d // h

        emb = nn.Embed(self.vocab_size, d,
                       embedding_init=nn.initializers.normal(0.02),
                       name='embed')
        src = emb(src_tokens)
        tgt = emb(tgt_tokens)

        # causal self-attention over target
        q = nn.Dense(d, kernel_init=_init, name='q')(tgt).reshape(b, t, h, hd)
        k = nn.Dense(d, kernel_init=_init, name='k')(tgt).reshape(b, t, h, hd)
        v = nn.Dense(d, kernel_init=_init, name='v')(tgt).reshape(b, t, h, hd)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        hidden = mha_attention(q, k, v, causal).reshape(b, t, d)
        hidden = nn.LayerNorm()(tgt + hidden)

        # copy attention over source elements
        cq = nn.Dense(d, kernel_init=_init, name='cq')(hidden)
        ck = nn.Dense(d, kernel_init=_init, name='ck')(src)
        scores = jnp.einsum('btd,bsd->bts', cq, ck) / jnp.sqrt(d)
        scores = jnp.where(src_mask[:, None, :], scores, -1e30)
        copy_attn = jax.nn.softmax(scores, axis=-1)          # [B, T, S]
        context = jnp.einsum('bts,bsd->btd', copy_attn, src)

        # generate distribution + gate
        gen_logits = nn.Dense(self.vocab_size, kernel_init=_init,
                              name='gen')(jnp.concatenate([hidden, context], -1))
        p_gen = jax.nn.sigmoid(
            nn.Dense(1, kernel_init=_init, name='gate')(
                jnp.concatenate([hidden, context], -1)))     # [B, T, 1]

        gen_probs = jax.nn.softmax(gen_logits, axis=-1)
        # scatter copy probabilities onto their vocab ids
        copy_probs = jnp.zeros_like(gen_probs)
        onehot = jax.nn.one_hot(src_tokens, self.vocab_size)  # [B, S, V]
        copy_probs = jnp.einsum('bts,bsv->btv', copy_attn, onehot)

        mix = p_gen * gen_probs + (1.0 - p_gen) * copy_probs
        return {'log_probs': jnp.log(jnp.clip(mix, 1e-9)),
                'p_gen': p_gen[..., 0], 'copy_attention': copy_attn}
