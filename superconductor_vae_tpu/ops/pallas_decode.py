"""Pallas TPU fused decode-step attention (cache update + masked attention).

The generation scan's single-token step is the hot op of RL rollouts,
true-AR eval, and the discovery pipeline (reference analogue: the
hand-rolled per-step cache at autoregressive_decoder.py:1175-1319).  Per
step XLA emits: dynamic_update_slice into the [B,H,T,Dh] caches, a
broadcast q·K reduction, masked softmax, and a probs·V reduction.  This
kernel fuses all four into one VMEM-resident program per batch block: the
new K/V rows are written in place (``input_output_aliases``) and attention
reads the cache while it is still in VMEM, so the caches make exactly one
HBM round-trip per step instead of two.

Shape reality check (documented for the bench): at this model's native
decode shapes (head_dim 72 -> 128-lane padding, T<=38 -> sublane padding)
the op is DMA-bound and XLA's fused HLO is already near the streaming
floor, so the expected win is the removed second cache pass, not compute.
``bench.py --pallas-decode`` measures both paths on chip; the kernel is
kept only where it wins (same policy as ops/pallas_attention.py).

Correctness is tested in interpreter mode on CPU (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _decode_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                   o_ref, ko_ref, vo_ref, *, real_dh: int):
    """One batch-block program.

    Refs: pos [1] (SMEM), q/k_new/v_new [Bb,H,Dh], caches [Bb,H,T,Dh]
    (aliased in->out), out [Bb,H,Dh].
    """
    pos = pos_ref[0]
    t = k_ref.shape[2]

    # in-place cache row write at the current position
    kn = kn_ref[...]
    vn = vn_ref[...]
    ko_ref[:, :, pl.ds(pos, 1), :] = kn[:, :, None, :]
    vo_ref[:, :, pl.ds(pos, 1), :] = vn[:, :, None, :]

    # attention over positions <= pos, reading the just-updated cache
    k = ko_ref[...]                                     # [Bb,H,T,Dh]
    v = vo_ref[...]
    q = q_ref[...].astype(jnp.float32)
    scale = 1.0 / np.sqrt(real_dh)
    s = jnp.sum(q[:, :, None, :] * k.astype(jnp.float32), axis=-1) * scale
    t_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(t_pos <= pos, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.sum(p[..., None] * v.astype(jnp.float32), axis=2)
    o_ref[...] = o.astype(o_ref.dtype)


def decode_step_attention(
    q: jnp.ndarray,        # [B, H, Dh]
    k_new: jnp.ndarray,    # [B, H, Dh]
    v_new: jnp.ndarray,    # [B, H, Dh]
    k_cache: jnp.ndarray,  # [B, H, T, Dh]
    v_cache: jnp.ndarray,  # [B, H, T, Dh]
    position: jnp.ndarray,  # scalar int32
    block_b: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused cache-update + masked single-token attention.

    Returns (attn_out [B,H,Dh], k_cache', v_cache').  Semantics match the
    XLA path in models/decoder.py DecoderLayer.step: write the new K/V row
    at ``position``, attend over cache slots <= position.
    """
    b, h, dh = q.shape
    t = k_cache.shape[2]
    block_b = min(block_b, b)
    assert b % block_b == 0, (b, block_b)
    pos_arr = jnp.asarray(position, jnp.int32).reshape(1)

    bspec3 = pl.BlockSpec((block_b, h, dh), lambda i: (i, 0, 0))
    bspec4 = pl.BlockSpec((block_b, h, t, dh), lambda i: (i, 0, 0, 0))
    out, k2, v2 = pl.pallas_call(
        functools.partial(_decode_kernel, real_dh=dh),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec3, bspec3, bspec3, bspec4, bspec4,
        ],
        out_specs=[bspec3, bspec4, bspec4],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, dh), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(pos_arr, q, k_new, v_new, k_cache, v_cache)
    return out, k2, v2


def decode_step_attention_xla(q, k_new, v_new, k_cache, v_cache, position):
    """Reference XLA implementation (mirrors DecoderLayer.step)."""
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, k_new[:, :, None, :], position, axis=2)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, v_new[:, :, None, :], position, axis=2)
    dh = q.shape[-1]
    s = jnp.einsum('bhd,bhtd->bht', q.astype(jnp.float32),
                   k_cache.astype(jnp.float32)) / np.sqrt(dh)
    t_pos = jnp.arange(k_cache.shape[2])[None, None, :]
    s = jnp.where(t_pos <= position, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum('bht,bhtd->bhd', p, v_cache.astype(jnp.float32))
    return o.astype(q.dtype), k_cache, v_cache
