"""Policy-gradient training: SCST and batched RLOO, fully in-jit.

Capability parity with the reference's RL stack
(reference: train_v12_clean.py:2642-3022 ``compute_rloo_autoregressive`` /
``compute_scst``), redesigned for TPU:

- RLOO's K samples are the reference's batch-expansion trick
  ([B] -> [B*K], train_v12_clean.py:2673-2688) — here a ``jnp.tile`` feeding
  ONE batched KV-cache rollout, so the MXU sees a K-times-larger batch
  instead of K sequential decodes.
- SCST's greedy baseline and sampled rollout share the precomputed memory
  and cross-attention K/V (generation/generate.py), and both run as
  fixed-shape scans inside the same jitted step as the supervised loss.
- Rewards + constraint rewards are the vectorized kernels in ops/reward.py /
  ops/constraints.py — no host round-trips anywhere in the RL path (the
  reference's constraint rewards bounce through ``.cpu()``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..generation.generate import GenerationConfig, generate_with_kv_cache
from .constraints import ConstraintConfig, constraint_rewards
from .reward import RewardConfig, compute_reward


@dataclasses.dataclass(frozen=True)
class RLConfig:
    method: str = 'scst'              # 'scst' | 'rloo'
    n_samples_rloo: int = 4
    temperature: float = 1.2
    entropy_weight: float = 0.2
    max_len: int = 30
    stop_boost: float = 10.0
    hard_stop_threshold: float = 0.8
    site_dup_threshold: float = 0.0
    use_type_masking: bool = True
    reward: RewardConfig = RewardConfig()
    constraints: ConstraintConfig = ConstraintConfig()
    use_constraint_rewards: bool = True
    # batch-Jaccard novelty bonus (reference: entropy_maintenance.py:735
    # NoveltyBonus; 0 = off, the reference's default strategies don't use it)
    novelty_weight: float = 0.0
    novelty_k: int = 5


def _pad_to(x: jnp.ndarray, t: int, value) -> jnp.ndarray:
    cur = x.shape[1]
    if cur == t:
        return x
    if cur > t:
        return x[:, :t]
    pad = jnp.full((x.shape[0], t - cur), value, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=1)


def _total_reward(sampled, targets, mask, cfg: RLConfig, luts,
                  family_predictions):
    r = compute_reward(sampled, targets, mask, cfg.reward,
                       fraction_values=luts['fraction_values'])
    if cfg.use_constraint_rewards:
        r = r + constraint_rewards(
            sampled, mask, luts['token_to_z'], luts['token_value_table'],
            cfg.constraints, family_predictions=family_predictions)
    if cfg.novelty_weight > 0:
        from .reward import batch_novelty_bonus
        r = r + batch_novelty_bonus(
            sampled, mask, int(luts['token_value_table'].shape[0]),
            k_nearest=cfg.novelty_k, weight=cfg.novelty_weight)
    return r


def _rollout(decoder, variables, z, stoich, heads_vec, rng, cfg: RLConfig,
             luts, greedy: bool, temperature=None):
    gcfg = GenerationConfig(
        max_len=cfg.max_len,
        temperature=0.0 if greedy else cfg.temperature,
        stop_boost=cfg.stop_boost,
        hard_stop_threshold=cfg.hard_stop_threshold,
        site_dup_threshold=cfg.site_dup_threshold,
        use_type_masking=cfg.use_type_masking,
    )
    return generate_with_kv_cache(
        decoder, variables, z, stoich, heads_vec, rng, gcfg,
        type_masks=luts['type_masks'] if cfg.use_type_masking else None,
        temperature=None if greedy else temperature)


def scst_loss(
    decoder, variables,
    z: jnp.ndarray, stoich: jnp.ndarray, heads_vec: jnp.ndarray,
    targets: jnp.ndarray,             # [B, T] (tokens[:, 1:])
    rng: jax.Array,
    cfg: RLConfig,
    luts: Dict[str, jnp.ndarray],
    family_predictions: Optional[jnp.ndarray] = None,
    sc_weight: Optional[jnp.ndarray] = None,   # [B] 1 for SC rows else 0
    temperature: Optional[jnp.ndarray] = None,
    position_entropy_w: Optional[jnp.ndarray] = None,  # [T] per-pos weights
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Self-critical sequence training.
    Returns (loss, mean_reward, entropy, extras{reward_var})."""
    t = targets.shape[1]
    g_rng, s_rng = jax.random.split(rng)

    greedy = _rollout(decoder, variables, z, stoich, heads_vec, g_rng,
                      cfg, luts, greedy=True)
    g_tokens = _pad_to(greedy['tokens'], t, 0)
    g_mask = _pad_to(greedy['mask'], t, 0.0)
    g_reward = _total_reward(g_tokens, targets, g_mask, cfg, luts,
                             family_predictions)
    g_reward = jax.lax.stop_gradient(g_reward)

    sample = _rollout(decoder, variables, z, stoich, heads_vec, s_rng,
                      cfg, luts, greedy=False, temperature=temperature)
    s_tokens = _pad_to(sample['tokens'], t, 0)
    s_mask = _pad_to(sample['mask'], t, 0.0)
    s_logp = _pad_to(sample['log_probs'], t, 0.0)
    s_ent = _pad_to(sample['entropy'], t, 0.0)
    s_reward = jax.lax.stop_gradient(
        _total_reward(s_tokens, targets, s_mask, cfg, luts,
                      family_predictions))

    adv = s_reward - g_reward
    seq_logp = (s_logp * s_mask).sum(axis=1)
    per_sample = -(adv * seq_logp)
    if sc_weight is not None:
        per_sample = per_sample * sc_weight
    loss = per_sample.mean()

    ent_w = s_ent * s_mask
    if position_entropy_w is not None:
        # per-position weighting: explore harder where errors concentrate
        # (reference: entropy_maintenance.py:650-733 PerPositionEntropyWeighter)
        ent_w = ent_w * position_entropy_w[None, :s_ent.shape[1]]
    seq_ent = ent_w.sum(axis=1) / jnp.clip(s_mask.sum(axis=1), 1.0)
    extras = {'reward_var': jnp.var(s_reward)}
    return loss, s_reward.mean(), seq_ent.mean(), extras


def rloo_loss(
    decoder, variables,
    z: jnp.ndarray, stoich: jnp.ndarray, heads_vec: jnp.ndarray,
    targets: jnp.ndarray,
    rng: jax.Array,
    cfg: RLConfig,
    luts: Dict[str, jnp.ndarray],
    family_predictions: Optional[jnp.ndarray] = None,
    sc_weight: Optional[jnp.ndarray] = None,
    temperature: Optional[jnp.ndarray] = None,
    entropy_weight: Optional[jnp.ndarray] = None,
    position_entropy_w: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """RLOO with K leave-one-out baselines, one batched rollout of [B*K]."""
    b, t = targets.shape
    k = cfg.n_samples_rloo

    z_k = jnp.tile(z, (k, 1))
    stoich_k = jnp.tile(stoich, (k, 1))
    heads_k = jnp.tile(heads_vec, (k, 1))
    targets_k = jnp.tile(targets, (k, 1))
    fam_k = (jnp.tile(family_predictions, (k, 1))
             if family_predictions is not None else None)

    sample = _rollout(decoder, variables, z_k, stoich_k, heads_k, rng,
                      cfg, luts, greedy=False, temperature=temperature)
    s_tokens = _pad_to(sample['tokens'], t, 0)
    s_mask = _pad_to(sample['mask'], t, 0.0)
    s_logp = _pad_to(sample['log_probs'], t, 0.0)
    s_ent = _pad_to(sample['entropy'], t, 0.0)

    task_r = _total_reward(s_tokens, targets_k, s_mask, cfg, luts, fam_k)
    ent_pos = s_ent * s_mask
    if position_entropy_w is not None:
        ent_pos = ent_pos * position_entropy_w[None, :s_ent.shape[1]]
    seq_ent = ent_pos.sum(axis=1) / jnp.clip(s_mask.sum(axis=1), 1.0)
    ent_w = cfg.entropy_weight if entropy_weight is None else entropy_weight
    rewards = jax.lax.stop_gradient(task_r + ent_w * seq_ent)

    seq_logp = (s_logp * s_mask).sum(axis=1)
    r = rewards.reshape(k, b)
    lp = seq_logp.reshape(k, b)
    total = r.sum(axis=0, keepdims=True)
    baseline = (total - r) / max(k - 1, 1)
    adv = r - baseline
    per_sample = -(adv * lp)                                  # [K, B]
    if sc_weight is not None:
        per_sample = per_sample * sc_weight[None, :]
    # each sample contributes its own gradient; sum over K of per-K means
    loss = per_sample.mean(axis=1).sum()
    extras = {'reward_var': jnp.var(task_r)}
    return loss, r.mean(), seq_ent.mean(), extras
