"""Tensor-native REINFORCE reward (V14 continuous power-law).

Capability parity with the reference GPU-native reward
(reference: src/superconductor/losses/reward_gpu_native.py:449-726 with the
V14 continuous branch at :560-664): exact-match bonus, length-only
("perfect prefix, too long") and too-short special cases, continuous
``max_reward * (n_correct/n_total)^sharpness`` base, token-type-aware
penalties, fraction-VALUE-scaled penalties via the tokenizer LUT, and a
length-mismatch penalty — all pure jnp, jit/vmap-safe, differentiable-free
(rewards are targets, not gradients).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..tokenizer import (
    EOS_ID, ELEMENT_TOKEN_START, INTEGER_TOKEN_START, FRACTION_TOKEN_START,
)


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """V14 continuous reward parameters
    (reference defaults: train_v12_clean.py:556-566)."""
    exact_match: float = 100.0
    max_reward: float = 100.0
    sharpness: float = 4.0
    element_error_penalty: float = -3.0
    integer_error_penalty: float = -1.0
    fraction_error_penalty: float = -0.5
    special_error_penalty: float = -0.5
    fraction_value_penalty: float = -10.0   # base for value-scaled fraction errs
    fraction_value_scale: float = 2.0
    length_mismatch_penalty: float = -2.0
    length_only_base_reward: float = 50.0
    length_only_per_extra: float = 5.0
    length_only_floor: float = 10.0
    too_short_base_reward: float = 50.0
    too_short_per_missing: float = 5.0
    too_short_floor: float = 10.0
    floor: float = -100.0


def _end_positions(tokens, mask):
    has_end = ((tokens == EOS_ID) & mask).any(axis=1)
    pos = jnp.argmax(((tokens == EOS_ID) & mask).astype(jnp.int32), axis=1)
    return jnp.where(has_end, pos.astype(jnp.float32),
                     mask.sum(axis=1).astype(jnp.float32)), has_end


def fraction_value_penalty(sampled, target, mask, fraction_values,
                           base_penalty: float, scale: float) -> jnp.ndarray:
    """Penalty scaled by |value(pred) - value(target)| at fraction mismatches
    (reference: reward_gpu_native.py:282-344)."""
    v = fraction_values.shape[0]
    target_is_frac = (target >= FRACTION_TOKEN_START) & mask
    mism = (sampled != target) & target_is_frac
    sv = fraction_values[jnp.clip(sampled, 0, v - 1)]
    tv = fraction_values[jnp.clip(target, 0, v - 1)]
    diff = jnp.abs(sv - tv)
    pen_scale = 1.0 + scale * jnp.clip(diff, 0.0, 20.0) / 20.0
    return (mism * base_penalty * pen_scale).sum(axis=1)


def token_type_penalties(sampled, target, mask, cfg: RewardConfig,
                         skip_fraction: bool) -> jnp.ndarray:
    """Per-type penalties at mismatch positions
    (reference: reward_gpu_native.py:346-405)."""
    mism = (sampled != target) & mask
    is_el = (target >= ELEMENT_TOKEN_START) & (target < INTEGER_TOKEN_START) & mism
    is_int = (target >= INTEGER_TOKEN_START) & (target < FRACTION_TOKEN_START) & mism
    is_frac = (target >= FRACTION_TOKEN_START) & mism
    is_special = mism & ~is_el & ~is_int & ~is_frac
    pen = (is_el.sum(axis=1) * cfg.element_error_penalty
           + is_int.sum(axis=1) * cfg.integer_error_penalty
           + is_special.sum(axis=1) * cfg.special_error_penalty)
    if not skip_fraction:
        pen = pen + is_frac.sum(axis=1) * cfg.fraction_error_penalty
    return pen


def compute_reward(
    sampled: jnp.ndarray,             # [B, T] int32
    target: jnp.ndarray,              # [B, T] int32
    mask: jnp.ndarray,                # [B, T] float/bool (valid positions)
    cfg: RewardConfig = RewardConfig(),
    fraction_values: Optional[jnp.ndarray] = None,  # [V] tokenizer LUT
) -> jnp.ndarray:
    """[B] rewards."""
    mask = mask.astype(bool)
    b, t = sampled.shape

    matches = (sampled == target) & mask
    mismatches = (sampled != target) & mask
    n_mismatch = mismatches.sum(axis=1)
    exact = n_mismatch == 0

    sampled_end, sampled_has_end = _end_positions(sampled, mask)
    target_end, _ = _end_positions(target, mask)
    length_diff = jnp.abs(sampled_end - target_end)

    if fraction_values is not None:
        frac_pen = fraction_value_penalty(
            sampled, target, mask, fraction_values,
            cfg.fraction_value_penalty, cfg.fraction_value_scale)
        skip_frac_type = True
    else:
        frac_pen = jnp.zeros(b)
        skip_frac_type = False

    positions = jnp.arange(t)[None, :].astype(jnp.float32)
    not_exact = ~exact

    # length-only: perfect prefix up to target END, sampled runs long
    before_tgt_end = positions < target_end[:, None]
    prefix_ok = ((sampled == target) | ~before_tgt_end | ~mask).all(axis=1)
    too_long = sampled_end > target_end
    length_only = prefix_ok & too_long & not_exact
    extra = jnp.clip(sampled_end - target_end, 0.0)
    lo_reward = jnp.clip(cfg.length_only_base_reward
                         - extra * cfg.length_only_per_extra,
                         cfg.length_only_floor)

    # too-short: perfect prefix up to sampled END, actually emitted END early
    before_smp_end = positions < sampled_end[:, None]
    prefix_smp_ok = ((sampled == target) | ~before_smp_end | ~mask).all(axis=1)
    too_short = (sampled_end < target_end) & sampled_has_end
    ts_case = prefix_smp_ok & too_short & not_exact & ~length_only
    missing = jnp.clip(target_end - sampled_end, 0.0)
    ts_reward = jnp.clip(cfg.too_short_base_reward
                         - missing * cfg.too_short_per_missing,
                         cfg.too_short_floor)

    # continuous base over content tokens (up to and incl. target END)
    content_len = jnp.clip(target_end + 1.0, 1.0)
    at_or_before = positions <= target_end[:, None]
    content_matches = (matches & at_or_before).sum(axis=1).astype(jnp.float32)
    ratio = jnp.clip(content_matches / content_len, 0.0, 1.0)
    continuous = cfg.max_reward * ratio ** cfg.sharpness

    type_pen = token_type_penalties(sampled, target, mask, cfg, skip_frac_type)
    length_pen = length_diff * cfg.length_mismatch_penalty
    general = jnp.clip(continuous + type_pen + frac_pen + length_pen,
                       cfg.floor)

    rewards = jnp.where(exact, cfg.exact_match, general)
    rewards = jnp.where(length_only, lo_reward, rewards)
    rewards = jnp.where(ts_case, ts_reward, rewards)
    return rewards


def batch_novelty_bonus(
    sampled: jnp.ndarray,            # [B, T] token ids
    mask: jnp.ndarray,               # [B, T] valid-token mask
    vocab_size: int,
    k_nearest: int = 5,
    weight: float = 0.1,
) -> jnp.ndarray:
    """In-jit novelty bonus: Jaccard dissimilarity to the batch's own
    rollouts (reference: training/entropy_maintenance.py:735-845
    NoveltyBonus — the reference compares against a host-side history
    buffer with per-pair Levenshtein in Python; on TPU the batch itself is
    the reference set and token-set Jaccard becomes one [B, V] x [V, B]
    matmul on the MXU, keeping the whole RL step device-resident).

    Returns [B] bonuses in [0, weight]: rows whose token set is far from
    their k most-similar batch neighbours earn more.
    """
    import jax
    b = sampled.shape[0]
    rows = jnp.arange(b)[:, None] * jnp.ones_like(sampled)
    presence = jnp.zeros((b, vocab_size), jnp.float32).at[
        rows.reshape(-1), sampled.reshape(-1)].max(
        mask.reshape(-1).astype(jnp.float32))
    inter = presence @ presence.T                             # [B, B]
    counts = presence.sum(axis=1)
    union = counts[:, None] + counts[None, :] - inter
    jaccard = inter / jnp.clip(union, 1.0)
    # exclude self-similarity, take the k most similar neighbours
    jaccard = jaccard - 2.0 * jnp.eye(b)
    k = min(k_nearest, max(b - 1, 1))
    top_sim, _ = jax.lax.top_k(jaccard, k)
    novelty = 1.0 - jnp.clip(top_sim, 0.0, 1.0).mean(axis=1)
    return weight * jax.lax.stop_gradient(novelty)
