"""DETR-style set prediction decoder (V16 parallel path, Flax).

Capability parity with the reference ``SetFormulaDecoder``
(reference: src/superconductor/models/set_decoder.py:22-222): 12 learned slot
queries run through self+cross-attention layers over projected z tokens, with
an element head [12, 119], a softplus fraction head, and a presence head —
order-free formula prediction with no exposure bias.

Class convention here: element class 0 = empty/no-object, classes 1..118 =
atomic number Z (the reference uses 118 elements + trailing empty class;
0-as-empty matches our Z-indexed tables and the padding convention of the
composition arrays).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import mha_attention

_dense_init = nn.initializers.xavier_uniform()

# Parity with the torch reference: exact (erf) GELU and LayerNorm eps=1e-5
# (torch defaults; flax defaults differ: tanh-approx GELU, eps=1e-6).
import functools as _functools
_gelu = _functools.partial(nn.gelu, approximate=False)
_LN = _functools.partial(nn.LayerNorm, epsilon=1e-5)



class SetDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, slots, memory, *, deterministic: bool = True):
        b, s, d = slots.shape
        h, hd = self.nhead, self.d_model // self.nhead

        def mha(name, q_in, kv_in):
            q = nn.Dense(d, kernel_init=_dense_init, dtype=self.dtype,
                         name=f'{name}_q')(q_in).reshape(b, -1, h, hd)
            k = nn.Dense(d, kernel_init=_dense_init, dtype=self.dtype,
                         name=f'{name}_k')(kv_in).reshape(b, -1, h, hd)
            v = nn.Dense(d, kernel_init=_dense_init, dtype=self.dtype,
                         name=f'{name}_v')(kv_in).reshape(b, -1, h, hd)
            o = mha_attention(q, k, v).reshape(b, -1, d)
            return nn.Dense(d, kernel_init=_dense_init, dtype=self.dtype,
                            name=f'{name}_o')(o)

        x = _LN(dtype=self.dtype)(slots)
        slots = slots + mha('self', x, x)            # slots coordinate
        x = _LN(dtype=self.dtype)(slots)
        slots = slots + mha('cross', x, memory)      # read latent memory
        x = _LN(dtype=self.dtype)(slots)
        y = nn.Dense(self.dim_feedforward, kernel_init=_dense_init,
                     dtype=self.dtype)(x)
        y = nn.Dense(d, kernel_init=_dense_init, dtype=self.dtype)(
            _gelu(y))
        return slots + nn.Dropout(self.dropout)(y, deterministic=deterministic)


class SetFormulaDecoder(nn.Module):
    latent_dim: int = 2048
    d_model: int = 512
    nhead: int = 8
    num_layers: int = 3
    dim_feedforward: int = 1024
    n_slots: int = 12
    n_elements: int = 118
    n_z_tokens: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        b = z.shape[0]
        mem = nn.Dense(self.d_model * self.n_z_tokens,
                       kernel_init=_dense_init, dtype=self.dtype,
                       name='z_proj')(z.astype(self.dtype))
        mem = mem.reshape(b, self.n_z_tokens, self.d_model)

        queries = self.param('slot_queries', nn.initializers.normal(0.02),
                             (self.n_slots, self.d_model))
        slots = jnp.broadcast_to(queries[None], (b, self.n_slots, self.d_model))
        slots = slots.astype(self.dtype)

        for i in range(self.num_layers):
            slots = SetDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout, dtype=self.dtype, name=f'layer_{i}',
            )(slots, mem, deterministic=deterministic)

        slots = _LN(dtype=self.dtype)(slots)
        element_logits = nn.Dense(self.n_elements + 1,
                                  kernel_init=_dense_init, dtype=self.dtype,
                                  name='element_head')(slots)
        fraction_pred = nn.softplus(
            nn.Dense(1, kernel_init=_dense_init, dtype=self.dtype,
                     name='fraction_head')(slots))[..., 0]
        presence_logits = nn.Dense(1, kernel_init=_dense_init,
                                   dtype=self.dtype,
                                   name='presence_head')(slots)[..., 0]
        return {
            'element_logits': element_logits,   # [B, 12, 119], class 0=empty
            'fraction_pred': fraction_pred,     # [B, 12]
            'presence_logits': presence_logits,  # [B, 12]
        }
