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

    Refs: pos [1] (SMEM), q/k_new/v_new [Bb,H,1,Dh], caches [Bb,H,T,Dh]
    (aliased in->out), out [Bb,H,1,Dh].

    Everything stays rank-4 — Mosaic rejects mid-shape unit-dim inserts
    (``x[:, :, None, :]`` is an unsupported vector shape cast on TPU), so
    the callers pre-shape the per-step rows to [B,H,1,Dh] and the kernel
    uses only same-rank broadcasts and axis reductions.
    """
    pos = pos_ref[0]

    # Cache row write at the current position, as a masked full-block
    # select: a dynamic single-row store on the sublane dim would need
    # 8-aligned indices ("cannot statically prove index is a multiple
    # of 8"), and the full block is already making one HBM round trip
    # through the aliased output, so the select costs no extra DMA.
    row = jax.lax.broadcasted_iota(jnp.int32, k_ref.shape, 2)
    at_pos = row == pos
    kc = jnp.where(at_pos, kn_ref[...], k_ref[...])     # [Bb,H,T,Dh]
    vc = jnp.where(at_pos, vn_ref[...], v_ref[...])
    ko_ref[...] = kc
    vo_ref[...] = vc

    # attention over positions <= pos, on the just-updated cache
    k = kc.astype(jnp.float32)
    v = vc.astype(jnp.float32)
    q = q_ref[...].astype(jnp.float32)                  # [Bb,H,1,Dh]
    scale = 1.0 / np.sqrt(real_dh)
    # s: [Bb,H,T,1] — lane reduce keeps rank
    s = jnp.sum(q * k, axis=-1, keepdims=True) * scale
    t_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(t_pos <= pos, s, _NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)               # [Bb,H,1,1]
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    # o: [Bb,H,1,Dh] — sublane reduce with keepdims
    o = jnp.sum(p * v, axis=2, keepdims=True)
    o_ref[...] = o.astype(o_ref.dtype)


def decode_step_attention(
    q: jnp.ndarray,        # [B, H, Dh]
    k_new: jnp.ndarray,    # [B, H, Dh]
    v_new: jnp.ndarray,    # [B, H, Dh]
    k_cache: jnp.ndarray,  # [B, H, T, Dh]
    v_cache: jnp.ndarray,  # [B, H, T, Dh]
    position: jnp.ndarray,  # scalar int32
    block_b: int = 16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused cache-update + masked single-token attention.

    Returns (attn_out [B,H,Dh], k_cache', v_cache').  Semantics match the
    XLA path in models/decoder.py DecoderLayer.step: write the new K/V row
    at ``position``, attend over cache slots <= position.
    """
    b, h, dh = q.shape
    t = k_cache.shape[2]
    # block_b=16 keeps the per-program VMEM residency (bf16 K+V blocks,
    # their aliased outputs, and the f32 attention intermediates, each
    # [Bb,H,T,128-padded]) comfortably under the ~16MB scoped budget with
    # Mosaic's cross-step double-buffering — block 32 was marginal and
    # OOM'd at eval batch 256 (docs/RESULTS.md round-4 A/B)
    block_b = min(block_b, b)
    while b % block_b:       # largest divisor of b that fits the budget
        block_b -= 1
    pos_arr = jnp.asarray(position, jnp.int32).reshape(1)

    # rank-extend OUTSIDE the kernel (free in XLA; unsupported in Mosaic)
    q4 = q[:, :, None, :]
    kn4 = k_new[:, :, None, :]
    vn4 = v_new[:, :, None, :]

    bspec_row = pl.BlockSpec((block_b, h, 1, dh), lambda i: (i, 0, 0, 0))
    bspec4 = pl.BlockSpec((block_b, h, t, dh), lambda i: (i, 0, 0, 0))
    out, k2, v2 = pl.pallas_call(
        functools.partial(_decode_kernel, real_dh=dh),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec_row, bspec_row, bspec_row, bspec4, bspec4,
        ],
        out_specs=[bspec_row, bspec4, bspec4],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, 1, dh), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(pos_arr, q4, kn4, vn4, k_cache, v_cache)
    return out[:, :, 0, :], k2, v2


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
