"""Attention primitives.

``mha_attention`` is the XLA-fused baseline used by the decoder; the Pallas
fused kernel in ops/pallas_attention.py is swapped in on TPU for the training
fast path when shapes warrant it (see ops/pallas_attention.py for the
dispatch).  At this model's shapes (seq<=30, mem=24, d=576) XLA's fusion of
QK^T -> softmax -> PV is already near roofline on the MXU; the Pallas path
matters for the large-batch RL rollouts.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mha_attention(
    q: jnp.ndarray,             # [B, Tq, H, Dh]
    k: jnp.ndarray,             # [B, Tk, H, Dh]
    v: jnp.ndarray,             # [B, Tk, H, Dh]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Tq, Tk], True=keep
) -> jnp.ndarray:
    """Scaled dot-product multi-head attention. Returns [B, Tq, H, Dh]."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, q.dtype))
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, v)


def causal_mask(seq_len: int) -> jnp.ndarray:
    """[1, 1, T, T] lower-triangular keep-mask."""
    m = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
    return m[None, None]
