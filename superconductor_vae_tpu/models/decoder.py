"""Transformer formula decoder (Flax) with fixed-shape KV-cache decoding.

Capability parity with the reference `EnhancedTransformerDecoder`
(reference: src/superconductor/models/autoregressive_decoder.py:544-2032):
12 pre-norm decoder layers cross-attending to 24 memory tokens built from
latent z (16) + stoichiometry conditioning (4) + encoder-head predictions (4),
with output projection, stop head, site-duplication head, and 5-way token-type
head.

TPU-first redesign of the generation path:

- The reference grows K/V tensors per step in Python
  (autoregressive_decoder.py:1266-1273).  Here the cache is a pre-allocated
  ``[L, B, max_len, H, Dh]`` array updated with ``dynamic_update_slice`` so
  the whole AR loop compiles to one XLA ``while``/``scan`` program with static
  shapes (see generation/generate.py).
- Cross-attention K/V over the 24 static memory tokens are projected ONCE per
  generation (``memory_kv``) and reused by every step — the per-step cross
  attention is just a query projection and a [B,1,H,Dh]x[B,24,H,Dh]
  contraction.  This generalizes the reference's ``precompute_memory``
  (autoregressive_decoder.py:875-899).
- Per-step Python branching (stop boost, hard stop, type masking, site-dup
  gating, NaN guards) becomes ``jnp.where`` chains in generation/generate.py.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import causal_mask, mha_attention
from .config import ModelConfig

_dense_init = nn.initializers.xavier_uniform()

# Parity with the torch reference: exact (erf) GELU and LayerNorm eps=1e-5
# (torch defaults; flax defaults differ: tanh-approx GELU, eps=1e-6).
import functools as _functools
_gelu = _functools.partial(nn.gelu, approximate=False)
_LN = _functools.partial(nn.LayerNorm, epsilon=1e-5)



def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """Standard sin/cos positional table [max_len, d_model]."""
    pos = np.arange(max_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d_model, 2).astype(np.float32)
                 * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return pe


def head_dup_map(old_d: int, new_d: int, groups: int) -> np.ndarray:
    """Uniform channel-duplication map [new_d] -> old channel index,
    block-structured per attention head so head splits stay aligned.
    Shared by width expansion (surgery.expand_decoder_width) and the
    positional table of expanded models (``positional_table``)."""
    assert new_d % old_d == 0 and old_d % groups == 0 and new_d % groups == 0
    go, gn = old_d // groups, new_d // groups
    m = np.zeros(new_d, np.int64)
    for h in range(groups):
        m[h * gn:(h + 1) * gn] = h * go + np.sort(
            np.tile(np.arange(go), gn // go))
    return m


def positional_table(cfg) -> np.ndarray:
    """Sinusoidal table at ``cfg.pos_dim`` (the pre-expansion width),
    channel-duplicated up to d_model with the residual-stream map so that
    width expansion preserves the function exactly (see ModelConfig.pos_dim)."""
    L = cfg.max_len + 8
    if cfg.pos_dim is None or cfg.pos_dim == cfg.d_model:
        return sinusoidal_positions(L, cfg.d_model)
    base = sinusoidal_positions(L, cfg.pos_dim)
    return base[:, head_dup_map(cfg.pos_dim, cfg.d_model, cfg.nhead)]


class DecoderLayer(nn.Module):
    """Pre-norm decoder layer: causal self-attn, cross-attn to memory, GELU FFN."""
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        d, h = cfg.d_model, cfg.nhead
        dense = lambda name: nn.Dense(d, kernel_init=_dense_init,
                                      dtype=self.dtype, name=name)
        self.norm1 = _LN(dtype=self.dtype)
        self.norm2 = _LN(dtype=self.dtype)
        self.norm3 = _LN(dtype=self.dtype)
        self.self_q, self.self_k = dense('self_q'), dense('self_k')
        self.self_v, self.self_o = dense('self_v'), dense('self_o')
        self.cross_q, self.cross_k = dense('cross_q'), dense('cross_k')
        self.cross_v, self.cross_o = dense('cross_v'), dense('cross_o')
        self.ff1 = nn.Dense(cfg.dim_feedforward, kernel_init=_dense_init,
                            dtype=self.dtype)
        self.ff2 = nn.Dense(d, kernel_init=_dense_init, dtype=self.dtype)
        self.drop = nn.Dropout(cfg.dropout)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.cfg.nhead, self.cfg.head_dim)

    def cross_kv(self, memory: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project the static memory to K/V once per generation. [B,M,H,Dh] x2."""
        return self._split(self.cross_k(memory)), self._split(self.cross_v(memory))

    def self_kv(self, x_norm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._split(self.self_k(x_norm)), self._split(self.self_v(x_norm))

    def __call__(self, x, memory, self_mask, *, deterministic: bool = True,
                 memory_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        b, t, d = x.shape
        # self attention (pre-norm)
        xn = self.norm1(x)
        q = self._split(self.self_q(xn))
        k, v = self.self_kv(xn)
        sa = mha_attention(q, k, v, self_mask).reshape(b, t, d)
        x = x + self.drop(self.self_o(sa), deterministic=deterministic)
        # cross attention to memory
        xn = self.norm2(x)
        q = self._split(self.cross_q(xn))
        mk, mv = memory_kv if memory_kv is not None else self.cross_kv(memory)
        ca = mha_attention(q, mk, mv).reshape(b, t, d)
        x = x + self.drop(self.cross_o(ca), deterministic=deterministic)
        # feed-forward
        xn = self.norm3(x)
        ff = self.ff2(self.drop(_gelu(self.ff1(xn)), deterministic=deterministic))
        return x + self.drop(ff, deterministic=deterministic)

    def step(self, x, k_cache, v_cache, memory_kv, position, valid_len):
        """Single-token forward with fixed-shape KV cache.

        Args:
          x: [B, 1, d] current token hidden state
          k_cache/v_cache: [B, max_len, H, Dh] pre-allocated caches
          memory_kv: (mk, mv) precomputed cross K/V
          position: scalar int32 current position
          valid_len: static int, cache capacity (== max_len)
        Returns: (x_out [B,1,d], k_cache, v_cache updated)
        """
        b = x.shape[0]
        d = self.cfg.d_model
        xn = self.norm1(x)
        q = self._split(self.self_q(xn))                      # [B,1,H,Dh]
        k_new, v_new = self.self_kv(xn)                       # [B,1,H,Dh]
        if self.cfg.pallas_decode:
            # fused cache-update + masked attention kernel; cache layout is
            # the kernel's [B, H, T, Dh] (init_cache allocates it that way
            # under the flag) so no per-step transposes of the cache
            from ..ops.pallas_decode import decode_step_attention
            sa, k_cache, v_cache = decode_step_attention(
                q[:, 0], k_new[:, 0], v_new[:, 0], k_cache, v_cache,
                position, interpret=jax.default_backend() == 'cpu')
            sa = sa.reshape(b, 1, d)
        else:
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k_new, position, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v_new, position, axis=1)
            # attend over positions <= current (mask unwritten cache slots)
            pos_ids = jnp.arange(valid_len)[None, None, None, :]  # [1,1,1,T]
            mask = pos_ids <= position
            sa = mha_attention(q, k_cache, v_cache, mask).reshape(b, 1, d)
        x = x + self.self_o(sa)
        xn = self.norm2(x)
        qc = self._split(self.cross_q(xn))
        mk, mv = memory_kv
        ca = mha_attention(qc, mk, mv).reshape(b, 1, d)
        x = x + self.cross_o(ca)
        xn = self.norm3(x)
        x = x + self.ff2(_gelu(self.ff1(xn)))
        return x, k_cache, v_cache


class MemoryBuilder(nn.Module):
    """z + stoich + head predictions -> [B, 24, d_model] memory tokens.

    Layout [latent(16) | stoich(4) | heads(4)] matching the reference
    ``_create_memory`` (autoregressive_decoder.py:779-873).
    """
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, stoich, heads_vec):
        cfg = self.cfg
        d = cfg.d_model
        b = z.shape[0]
        dt = self.dtype
        z = z.astype(dt)

        if cfg.memory_bottleneck_dim > 0:
            h = nn.Dense(cfg.memory_bottleneck_dim, kernel_init=_dense_init,
                         dtype=dt, name='latent_bottleneck')(z)
            h = _gelu(_LN(dtype=dt)(h))
            latent_mem = nn.Dense(d * cfg.n_memory_tokens, kernel_init=_dense_init,
                                  dtype=dt, name='latent_out')(h)
        else:
            h = _gelu(nn.Dense(d * cfg.n_memory_tokens // 2,
                                 kernel_init=_dense_init, dtype=dt,
                                 name='latent_mid')(z))
            latent_mem = nn.Dense(d * cfg.n_memory_tokens, kernel_init=_dense_init,
                                  dtype=dt, name='latent_out')(h)
        parts = [latent_mem.reshape(b, cfg.n_memory_tokens, d)]

        if cfg.n_stoich_tokens > 0:
            s = nn.Dense(d, kernel_init=_dense_init, dtype=dt,
                         name='stoich_mid')(stoich.astype(dt))
            s = _gelu(_LN(dtype=dt)(s))
            s = nn.Dense(d * cfg.n_stoich_tokens, kernel_init=_dense_init,
                         dtype=dt, name='stoich_out')(s)
            parts.append(s.reshape(b, cfg.n_stoich_tokens, d))

        if cfg.n_heads_tokens > 0:
            hh = nn.Dense(d // 2, kernel_init=_dense_init, dtype=dt,
                          name='heads_mid1')(heads_vec.astype(dt))
            hh = _gelu(_LN(dtype=dt)(hh))
            hh = _gelu(nn.Dense(d, kernel_init=_dense_init, dtype=dt,
                                  name='heads_mid2')(hh))
            hh = nn.Dense(d * cfg.n_heads_tokens, kernel_init=_dense_init,
                          dtype=dt, name='heads_out')(hh)
            parts.append(hh.reshape(b, cfg.n_heads_tokens, d))

        return jnp.concatenate(parts, axis=1)


class FormulaDecoder(nn.Module):
    """12-layer formula decoder with TF fast path and cached decode step."""
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        dt = self.dtype
        self.token_embedding = nn.Embed(
            cfg.vocab_size, cfg.d_model,
            embedding_init=nn.initializers.normal(0.02), dtype=dt)
        # +8 slack rows so chunked (speculative) decode can slice a full
        # chunk starting at the last position without dynamic-slice clamping
        self.pos_table = jnp.asarray(positional_table(cfg))
        self.memory_builder = MemoryBuilder(cfg, dtype=dt)
        self.layers = [DecoderLayer(cfg, dtype=dt, name=f'layer_{i}')
                       for i in range(cfg.num_layers)]
        self.drop = nn.Dropout(cfg.dropout)

        d = cfg.d_model
        self.out_ln = _LN(dtype=dt)
        self.out_d1 = nn.Dense(d, kernel_init=_dense_init, dtype=dt)
        self.out_d2 = nn.Dense(cfg.vocab_size, kernel_init=_dense_init, dtype=dt)
        self.stop_d1 = nn.Dense(d // 4, kernel_init=_dense_init, dtype=dt)
        self.stop_d2 = nn.Dense(1, kernel_init=_dense_init, dtype=dt)
        self.dup_d1 = nn.Dense(d // 4, kernel_init=_dense_init, dtype=dt)
        self.dup_d2 = nn.Dense(1, kernel_init=_dense_init, dtype=dt)
        self.type_ln = _LN(dtype=dt)
        self.type_d1 = nn.Dense(d, kernel_init=_dense_init, dtype=dt)
        self.type_d2 = nn.Dense(d // 4, kernel_init=_dense_init, dtype=dt)
        self.type_d3 = nn.Dense(5, kernel_init=_dense_init, dtype=dt)

    # -- heads ---------------------------------------------------------------
    def output_heads(self, h, *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Hidden states -> (vocab logits, stop, type, site-dup) heads."""
        y = self.out_ln(h)
        y = self.drop(_gelu(self.out_d1(y)), deterministic=deterministic)
        logits = self.out_d2(y)
        stop = self.stop_d2(_gelu(self.stop_d1(h)))[..., 0]
        dup = self.dup_d2(_gelu(self.dup_d1(h)))[..., 0]
        t = self.type_ln(h)
        t = self.drop(_gelu(self.type_d1(t)), deterministic=deterministic)
        t = self.drop(_gelu(self.type_d2(t)), deterministic=deterministic)
        type_logits = self.type_d3(t)
        return {'logits': logits, 'stop_logits': stop,
                'type_logits': type_logits, 'site_dup_logits': dup}

    # -- memory --------------------------------------------------------------
    def build_memory(self, z, stoich, heads_vec) -> jnp.ndarray:
        return self.memory_builder(z, stoich, heads_vec)

    def memory_kv(self, memory) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Per-layer cross-attention K/V, projected once per generation."""
        return [layer.cross_kv(memory) for layer in self.layers]

    # -- teacher-forced parallel forward --------------------------------------
    def __call__(self, z, target_tokens, stoich, heads_vec, *,
                 deterministic: bool = True,
                 memory: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """TF=1.0 fast path: one parallel causal forward.

        Args:
          target_tokens: [B, T] token ids incl. BOS/EOS/PAD.
        Returns dict with logits [B, T-1, V], generated argmax, stop/type/dup
        logits — the same contract as the reference forward
        (autoregressive_decoder.py:901-984).
        """
        if memory is None:
            memory = self.build_memory(z, stoich, heads_vec)
        inputs = target_tokens[:, :-1]
        return self.forward_embeds(self.token_embedding(inputs), memory,
                                   deterministic=deterministic)

    def forward_embeds(self, input_embeds, memory, *,
                       deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Parallel causal forward over explicit input embeddings
        (pre-positional).  Lets soft-token scheduled sampling feed
        probability-weighted embedding mixtures instead of token ids
        (training/soft_token.py; reference:
        training/soft_token_sampling.py:264-360)."""
        t = input_embeds.shape[1]
        x = input_embeds + self.pos_table[None, :t].astype(self.dtype)
        x = self.drop(x, deterministic=deterministic)
        mask = causal_mask(t)
        for layer in self.layers:
            x = layer(x, memory, mask, deterministic=deterministic)
        heads = self.output_heads(x, deterministic=deterministic)
        heads['generated'] = jnp.argmax(heads['logits'], axis=-1)
        heads['memory'] = memory
        return heads

    def embed_hard(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Token ids -> embeddings (exposed for the soft-token mixer)."""
        return self.token_embedding(tokens)

    def embed_soft(self, probs: jnp.ndarray) -> jnp.ndarray:
        """Probability rows -> expected embedding: probs @ E
        (reference: soft_token_sampling.py:138-162 soft_embed)."""
        return probs @ self.token_embedding.embedding.astype(probs.dtype)

    # -- single-token cached step ---------------------------------------------
    def decode_step(self, token, position, k_caches, v_caches, memory_kvs):
        """One AR step through all layers with the fixed-shape cache.

        Args:
          token: [B] int32 current input token
          position: scalar int32
          k_caches/v_caches: [L, B, max_len, H, Dh]
          memory_kvs: list of per-layer (mk, mv)
        Returns: (head outputs dict for this position, k_caches, v_caches)
        """
        cfg = self.cfg
        x = self.token_embedding(token)[:, None, :]
        pe = jax.lax.dynamic_slice_in_dim(self.pos_table, position, 1, axis=0)
        x = x + pe[None].astype(self.dtype)[:, 0]
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, k_c, v_c = layer.step(
                x, k_caches[i], v_caches[i], memory_kvs[i], position,
                cfg.max_len)
            new_k.append(k_c)
            new_v.append(v_c)
        heads = self.output_heads(x, deterministic=True)
        heads = {k: v[:, 0] for k, v in heads.items()}
        return heads, jnp.stack(new_k), jnp.stack(new_v)

    def decode_chunk(self, tokens, position, k_caches, v_caches, memory_kvs):
        """K-token chunk forward with the fixed-shape cache (speculative
        verification): processes ``tokens [B, K]`` starting at ``position``,
        causal within the chunk, attending to all cached positions before it.

        Returns (head outputs over the K positions, k_caches, v_caches).
        """
        cfg = self.cfg
        b, k = tokens.shape
        x = self.token_embedding(tokens)
        pe = jax.lax.dynamic_slice_in_dim(self.pos_table, position, k, axis=0)
        x = x + pe[None].astype(self.dtype)
        q_pos = position + jnp.arange(k)                       # [K]
        cache_pos = jnp.arange(k_caches.shape[2])              # [T(+slack)]
        # query i attends cache slots <= position + i
        mask = cache_pos[None, None, None, :] <= q_pos[None, None, :, None]
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            xn = layer.norm1(x)
            q = layer._split(layer.self_q(xn))
            kk, vv = layer.self_kv(xn)
            k_c = jax.lax.dynamic_update_slice_in_dim(
                k_caches[i], kk, position, axis=1)
            v_c = jax.lax.dynamic_update_slice_in_dim(
                v_caches[i], vv, position, axis=1)
            sa = mha_attention(q, k_c, v_c, mask).reshape(b, k, cfg.d_model)
            x = x + layer.self_o(sa)
            xn = layer.norm2(x)
            qc = layer._split(layer.cross_q(xn))
            mk, mv = memory_kvs[i]
            ca = mha_attention(qc, mk, mv).reshape(b, k, cfg.d_model)
            x = x + layer.cross_o(ca)
            xn = layer.norm3(x)
            x = x + layer.ff2(_gelu(layer.ff1(xn)))
            new_k.append(k_c)
            new_v.append(v_c)
        heads = self.output_heads(x, deterministic=True)
        return heads, jnp.stack(new_k), jnp.stack(new_v)

    def decode_chunk_perrow(self, tokens, positions, k_caches, v_caches,
                            memory_kvs):
        """``decode_chunk`` with PER-ROW start positions.

        Speculative decoding advances each row by its own acceptance length
        (the reference re-verifies per row in Python,
        autoregressive_decoder.py:1643-1984; the round-1 batch-min pointer
        wasted accepted tokens).  Per-row cache writes use a dense
        gather+select over the (tiny, ≤38-slot) cache axis instead of a
        scatter — fully MXU/VPU-friendly, no dynamic shapes.

        Args:
          tokens: [B, K] chunk inputs per row
          positions: [B] int32 per-row start position
        Returns (head outputs over the K positions, k_caches, v_caches).
        """
        cfg = self.cfg
        b, k = tokens.shape
        x = self.token_embedding(tokens)
        pos_idx = jnp.clip(positions[:, None] + jnp.arange(k)[None, :],
                           0, self.pos_table.shape[0] - 1)     # [B, K]
        x = x + self.pos_table[pos_idx].astype(self.dtype)
        q_pos = pos_idx                                        # [B, K]
        t_cache = k_caches.shape[2]
        cache_pos = jnp.arange(t_cache)                        # [T]
        # query i of row b attends cache slots <= positions[b] + i
        mask = cache_pos[None, None, None, :] <= q_pos[:, None, :, None]
        # cache slot t of row b takes update row (t - positions[b]) if in range
        upd_idx = jnp.clip(cache_pos[None, :] - positions[:, None], 0, k - 1)
        in_range = ((cache_pos[None, :] >= positions[:, None])
                    & (cache_pos[None, :] < positions[:, None] + k))
        sel = in_range[:, :, None, None]

        def write(cache, upd):
            # cache [B, T, H, Dh], upd [B, K, H, Dh]
            g = jnp.take_along_axis(
                upd, jnp.broadcast_to(upd_idx[:, :, None, None],
                                      (b, t_cache) + upd.shape[2:]), axis=1)
            return jnp.where(sel, g, cache)

        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            xn = layer.norm1(x)
            q = layer._split(layer.self_q(xn))
            kk, vv = layer.self_kv(xn)
            k_c = write(k_caches[i], kk)
            v_c = write(v_caches[i], vv)
            sa = mha_attention(q, k_c, v_c, mask).reshape(b, k, cfg.d_model)
            x = x + layer.self_o(sa)
            xn = layer.norm2(x)
            qc = layer._split(layer.cross_q(xn))
            mk, mv = memory_kvs[i]
            ca = mha_attention(qc, mk, mv).reshape(b, k, cfg.d_model)
            x = x + layer.cross_o(ca)
            xn = layer.norm3(x)
            x = x + layer.ff2(_gelu(layer.ff1(xn)))
            new_k.append(k_c)
            new_v.append(v_c)
        heads = self.output_heads(x, deterministic=True)
        return heads, jnp.stack(new_k), jnp.stack(new_v)

    def init_cache(self, batch_size: int, extra: int = 0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """`extra` adds slack rows for chunked decode writes at the tail."""
        cfg = self.cfg
        if cfg.pallas_decode:
            assert extra == 0, 'speculative decode_chunk needs the XLA layout'
            shape = (cfg.num_layers, batch_size, cfg.nhead,
                     cfg.max_len, cfg.head_dim)
        else:
            shape = (cfg.num_layers, batch_size, cfg.max_len + extra,
                     cfg.nhead, cfg.head_dim)
        return (jnp.zeros(shape, dtype=self.dtype),
                jnp.zeros(shape, dtype=self.dtype))
