"""Vectorized token-stream statistics shared by rewards and constraints.

The reference extracts per-formula element amounts with per-sample Python
loops on CPU (reference: losses/constraint_rewards.py:172-268, 383-460 — note
the ``.cpu()`` round-trips in its A4/A7/B* paths).  Here the same quantities
are one-hot contractions over the whole batch, so reward shaping stays on
device inside the jitted RL step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tokenizer import (
    ELEMENT_TOKEN_START, INTEGER_TOKEN_START, FRACTION_TOKEN_START, EOS_ID,
)

N_Z = 119  # element accumulator size (Z index, 0 = padding)


def is_element_token(tokens: jnp.ndarray) -> jnp.ndarray:
    return (tokens >= ELEMENT_TOKEN_START) & (tokens < INTEGER_TOKEN_START)


def is_integer_token(tokens: jnp.ndarray) -> jnp.ndarray:
    return (tokens >= INTEGER_TOKEN_START) & (tokens < FRACTION_TOKEN_START)


def next_token_quantity(tokens: jnp.ndarray, mask: jnp.ndarray,
                        token_value_table: jnp.ndarray) -> jnp.ndarray:
    """For each position: the quantity implied by the FOLLOWING token
    (integer value or fraction value), else 1.0. [B, T]."""
    nxt = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros_like(tokens[:, :1])], axis=1)
    nxt_mask = jnp.concatenate(
        [mask[:, 1:], jnp.zeros_like(mask[:, :1])], axis=1)
    qty = token_value_table[jnp.clip(nxt, 0, token_value_table.shape[0] - 1)]
    return jnp.where((qty > 0) & (nxt_mask > 0), qty, 1.0)


def element_amounts(tokens: jnp.ndarray, mask: jnp.ndarray,
                    token_to_z: jnp.ndarray,
                    token_value_table: jnp.ndarray) -> jnp.ndarray:
    """Token stream -> per-element amount accumulator [B, 119].

    Element (and isotope) tokens contribute the quantity of their following
    subscript token (default 1).  Pure array ops: one-hot matmul instead of
    the reference's per-sample dict building.
    """
    valid = mask > 0
    z = token_to_z[jnp.clip(tokens, 0, token_to_z.shape[0] - 1)]  # [B, T]
    amt = next_token_quantity(tokens, mask, token_value_table)
    contrib = jnp.where((z > 0) & valid, amt, 0.0)                # [B, T]
    onehot = jax.nn.one_hot(z, N_Z, dtype=contrib.dtype)          # [B, T, 119]
    return jnp.einsum('bt,btz->bz', contrib, onehot)


def element_counts(tokens: jnp.ndarray, mask: jnp.ndarray,
                   token_to_z: jnp.ndarray) -> jnp.ndarray:
    """Occurrence count of each element Z in the stream. [B, 119]."""
    valid = mask > 0
    z = token_to_z[jnp.clip(tokens, 0, token_to_z.shape[0] - 1)]
    onehot = jax.nn.one_hot(z, N_Z, dtype=jnp.float32)
    return jnp.einsum('bt,btz->bz', ((z > 0) & valid).astype(jnp.float32), onehot)


def integer_subscripts(tokens: jnp.ndarray, mask: jnp.ndarray) -> tuple:
    """Per element-position integer subscript values (default 1).

    Returns (values [B, T] float, present [B, T] bool) where present marks
    element positions within the masked region.
    """
    valid = mask > 0
    elem = is_element_token(tokens) & valid
    nxt = jnp.concatenate([tokens[:, 1:], jnp.zeros_like(tokens[:, :1])], axis=1)
    nxt_valid = jnp.concatenate([valid[:, 1:], jnp.zeros_like(valid[:, :1])], axis=1)
    nxt_int = is_integer_token(nxt) & nxt_valid
    int_val = jnp.where(nxt_int, nxt - INTEGER_TOKEN_START + 1, 1)
    return jnp.where(elem, int_val, 1).astype(jnp.float32), elem


def stream_has_fraction(tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """True per sample if any fraction token appears in the masked region."""
    return ((tokens >= FRACTION_TOKEN_START) & (mask > 0)).any(axis=1)


def first_eos_position(tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Position of first EOS within mask, else number of valid tokens. [B]."""
    is_end = (tokens == EOS_ID) & (mask > 0)
    pos = jnp.argmax(is_end.astype(jnp.int32), axis=1)
    has = is_end.any(axis=1)
    return jnp.where(has, pos, mask.sum(axis=1)).astype(jnp.float32)
