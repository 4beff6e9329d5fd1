"""Pallas TPU fused attention kernel (flash-attention tiling).

The TPU-native replacement for the reference's cuDNN/Flash SDPA dependency
(reference: train_v12_clean.py:5985-5989 ``enable_flash_sdp``): QK^T ->
online-softmax -> PV fused in VMEM, grid over (batch*heads, query blocks),
never materializing the [T, T] score matrix in HBM.

Dispatch policy (``fused_attention``): at this model's native shapes
(T<=30, head_dim 72) XLA's own fusion is already optimal and tile padding
would waste MXU cycles, so the Pallas path engages only for sequences past
``MIN_PALLAS_LEN`` — it exists for the long-context variants and as the
hand-tuned floor.  Correctness is tested in interpreter mode on CPU against
the einsum reference (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MIN_PALLAS_LEN = 128   # below this, XLA fusion wins; above, tiling pays
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int,
                 causal: bool, q_block: int, real_dh: int):
    """One (batch*head, q-block) program: online softmax over K tiles."""
    qi = pl.program_id(1)
    q = q_ref[...]                                     # [q_block, d_padded]
    # scale by the REAL head dim, not the 128-lane padded one
    scale = 1.0 / np.sqrt(real_dh)

    m = jnp.full((q_block, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((q_block, 1), jnp.float32)
    acc = jnp.zeros((q_block, q.shape[-1]), jnp.float32)

    n_kb = seq_len // block_k

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :]     # [block_k, d]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale

        if causal:
            q_pos = qi * q_block + jax.lax.broadcasted_iota(
                jnp.int32, (q_block, block_k), 0)
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (q_block, block_k), 1)
            s = jnp.where(q_pos >= k_pos, s, _NEG_INF)

        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m, l, acc))
    o_ref[...] = (acc / jnp.clip(l, 1e-30)).astype(o_ref.dtype)


def pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     causal: bool = False,
                     block_q: int = 128, block_k: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused attention. q/k/v: [B, T, H, Dh] -> [B, T, H, Dh].

    Pads T to block multiples and Dh to the 128-lane width; padded keys are
    masked via the causal/in-range predicate inside the kernel.
    """
    b, tq, h, dh = q.shape
    tk = k.shape[1]
    dh_p = _round_up(dh, 128)
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)

    def pad(x, t_p):
        return jnp.pad(x, ((0, 0), (0, t_p - x.shape[1]), (0, 0),
                           (0, dh_p - dh)))

    # [B, T, H, D] -> [B*H, T, D]
    qp = pad(q, tq_p).transpose(0, 2, 1, 3).reshape(b * h, tq_p, dh_p)
    kp = pad(k, tk_p).transpose(0, 2, 1, 3).reshape(b * h, tk_p, dh_p)
    vp = pad(v, tk_p).transpose(0, 2, 1, 3).reshape(b * h, tk_p, dh_p)

    # The kernel always runs with the causal predicate, which also masks the
    # padded key positions: pads sit at k_pos >= real tk, and in causal
    # self-attention (tq == tk) every real query has q_pos < tk, so padded
    # keys never pass q_pos >= k_pos. Non-causal cross-attention takes the
    # XLA path in fused_attention instead.
    kernel = functools.partial(
        _attn_kernel, block_k=block_k, seq_len=tk_p,
        causal=True, q_block=block_q, real_dh=dh)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, tq_p // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, dh_p), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, tk_p, dh_p), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, tk_p, dh_p), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, dh_p), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, dh_p), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out.reshape(b, h, tq_p, dh_p).transpose(0, 2, 1, 3)
    return out[:, :tq, :, :dh]


def fused_attention(q, k, v, mask=None, causal=False,
                    force_pallas: bool = False, interpret: bool = False):
    """Dispatch: Pallas for long causal self-attention on TPU, XLA einsum
    otherwise (ops/attention.py)."""
    from .attention import mha_attention, causal_mask as _cm
    tq, tk = q.shape[1], k.shape[1]
    use_pallas = force_pallas or (
        causal and tq == tk and tq >= MIN_PALLAS_LEN
        and jax.default_backend() == 'tpu')
    if use_pallas and mask is None:
        return pallas_attention(q, k, v, causal=True, interpret=interpret)
    if causal and mask is None:
        mask = _cm(tq)
    return mha_attention(q, k, v, mask)
