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

TPU-first gradient path (round 4): the rollouts run with STOPPED-GRADIENT
params — they only produce sampled tokens, masks, entropy and rewards — and
the REINFORCE log-probs are recomputed by ONE parallel teacher-forced pass
over the sampled tokens (``rescore_log_probs``).  The gradient is identical
(same policy, same sampled actions; REINFORCE needs grad log pi at the
sampled tokens, which does not care where the log-prob is evaluated), but
the backward pass is now a TF-shaped parallel program the MXU tiles well,
instead of reverse-mode through a 29-step sequential ``lax.scan`` with
rematerialised decode steps.  The reference pays the same sequential-rollout
backward cost (train_v12_clean.py:2642-2688 backprops sampling-loop
log-probs); this is the TPU redesign of that hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..generation.generate import GenerationConfig, generate_with_kv_cache
from ..tokenizer import BOS_ID, ELEMENT_TOKEN_START, EOS_ID, INTEGER_TOKEN_START
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
    # rollouts are gradient-free (TF re-score carries the gradient), so the
    # sampling scan can exit as soon as every row has stopped
    early_exit: bool = True


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


def _gen_cfg(cfg: RLConfig, greedy: bool) -> GenerationConfig:
    return GenerationConfig(
        max_len=cfg.max_len,
        temperature=0.0 if greedy else cfg.temperature,
        stop_boost=cfg.stop_boost,
        hard_stop_threshold=cfg.hard_stop_threshold,
        site_dup_threshold=cfg.site_dup_threshold,
        use_type_masking=cfg.use_type_masking,
        early_exit=cfg.early_exit,
    )


def _rollout(decoder, variables, z, stoich, heads_vec, rng, cfg: RLConfig,
             luts, greedy: bool, temperature=None, memory=None,
             greedy_mask=None):
    return generate_with_kv_cache(
        decoder, variables, z, stoich, heads_vec, rng, _gen_cfg(cfg, greedy),
        type_masks=luts['type_masks'] if cfg.use_type_masking else None,
        temperature=None if greedy else temperature, memory=memory,
        greedy_mask=greedy_mask)


def _frozen_rollout_inputs(variables, z, stoich, heads_vec):
    """Stop-gradient copies for sampling: the rollout scan then carries no
    differentiable state, so XLA compiles it forward-only (no residuals, no
    rematerialised backward scan)."""
    sg = jax.lax.stop_gradient
    return jax.tree.map(sg, variables), sg(z), sg(stoich), sg(heads_vec)


def rescore_log_probs(
    decoder, variables,
    z: jnp.ndarray, stoich: jnp.ndarray, heads_vec: jnp.ndarray,
    tokens: jnp.ndarray,              # [B, T] sampled rollout (no BOS)
    cfg: RLConfig,
    luts: Dict[str, jnp.ndarray],
    temperature: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """log pi(sampled token) per position, via ONE parallel TF pass.

    Reconstructs the exact per-step sampling distribution of
    ``generate_with_kv_cache`` (type masking -> stop/length boost -> hard
    stop -> degenerate guard -> temperature) from the sampled token stream:
    the decoder is causal, so TF hidden states at position t equal the
    rollout's step-t hidden states, and the gating state (finished, seen
    elements) is a pure function of the tokens already emitted.
    Returns ``log_probs [B, T]`` (differentiable w.r.t. ``variables``/``z``).
    """
    from ..models.decoder import FormulaDecoder  # avoid cycle

    b, t = tokens.shape
    gcfg = _gen_cfg(cfg, greedy=False)
    if gcfg.top_k or gcfg.top_p < 1.0:
        raise NotImplementedError('rescore supports the RL gate stack only '
                                  '(no top-k/top-p)')

    inputs = jnp.concatenate(
        [jnp.full((b, 1), BOS_ID, jnp.int32), tokens.astype(jnp.int32)],
        axis=1)                                            # [B, T+1]
    heads = decoder.apply(variables, z, inputs, stoich, heads_vec,
                          deterministic=True)
    logits = heads['logits'].astype(jnp.float32)           # [B, T, V]
    neg_inf = jnp.finfo(logits.dtype).min
    pos = jnp.arange(t)                                    # step index

    # finished[t]: EOS emitted strictly before step t (rollout carry state)
    eos_cum = jnp.cumsum((tokens == EOS_ID).astype(jnp.int32), axis=1)
    finished = jnp.concatenate(
        [jnp.zeros((b, 1), bool), eos_cum[:, :-1] > 0], axis=1)  # [B, T]

    if gcfg.use_type_masking and luts.get('type_masks') is not None:
        ptype = jnp.argmax(heads['type_logits'].astype(jnp.float32), axis=-1)
        valid = luts['type_masks'][ptype]                  # [B, T, V]
        logits = jnp.where(valid, logits, neg_inf)

    if gcfg.site_dup_threshold > 0:
        # seen[t]: element tokens emitted before step t while unfinished
        is_elem = ((tokens >= ELEMENT_TOKEN_START)
                   & (tokens < INTEGER_TOKEN_START) & (~finished))
        onehot = (jax.nn.one_hot(tokens, logits.shape[-1], dtype=jnp.int32)
                  * is_elem[..., None].astype(jnp.int32))
        seen = jnp.cumsum(onehot, axis=1) - onehot > 0     # strictly before t
        dup_prob = jax.nn.sigmoid(heads['site_dup_logits'].astype(jnp.float32))
        suppress = (dup_prob < gcfg.site_dup_threshold) & (pos[None, :] > 0)
        logits = jnp.where(suppress[..., None] & seen,
                           jnp.asarray(-30.0, logits.dtype), logits)

    if gcfg.stop_boost > 0:
        stop_prob = jax.nn.sigmoid(heads['stop_logits'].astype(jnp.float32))
        boost = gcfg.stop_boost * stop_prob                # [B, T]
        length_boost = jnp.where(
            pos > gcfg.length_boost_start,
            gcfg.length_boost_scale * (pos - gcfg.length_boost_start)
            / max(gcfg.max_len - gcfg.length_boost_start, 1),
            0.0).astype(logits.dtype)                      # [T]
        logits = logits.at[:, :, EOS_ID].add(boost + length_boost[None, :])
        if gcfg.hard_stop_threshold > 0:
            force = (stop_prob > gcfg.hard_stop_threshold) & (~finished)
            forced = jnp.full((logits.shape[-1],), neg_inf,
                              logits.dtype).at[EOS_ID].set(100.0)
            logits = jnp.where(force[..., None], forced[None, None, :], logits)

    degenerate = (~jnp.isfinite(logits).any(axis=-1)
                  | jnp.isnan(logits).any(axis=-1))        # [B, T]
    safe = jnp.where(degenerate[..., None], jnp.zeros_like(logits), logits)
    temp = gcfg.temperature if temperature is None else temperature
    t_logits = safe / temp
    # same clipped-softmax log-prob formula as the rollout step
    probs = jnp.clip(jax.nn.softmax(t_logits, axis=-1), 1e-8)
    lp = jnp.take_along_axis(jnp.log(probs),
                             tokens[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]              # [B, T]
    return lp


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
    # One live RNG stream: since round 4 the greedy baseline is fused into
    # the single [2B] rollout below (the greedy half ignores the stream), so
    # there is no separate greedy key — the second split output is unused
    # and kept only so the sampled-token stream stays bit-identical to the
    # round-4 runs.  That fusion already changed the stream relative to
    # round 3's two-pass SCST, so per-step reproducibility against
    # pre-round-4 runs is not expected.
    _, s_rng = jax.random.split(rng)

    # sampling runs gradient-free on frozen params with ONE shared memory
    # precompute; greedy baseline + sampled rollout fuse into ONE [2B]
    # forward scan (decode steps are latency-bound: one double-batch scan
    # beats two sequential scans)
    b = targets.shape[0]
    fvars, fz, fstoich, fheads = _frozen_rollout_inputs(
        variables, z, stoich, heads_vec)
    from ..models.decoder import FormulaDecoder  # avoid cycle
    f_memory = decoder.apply(fvars, fz, fstoich, fheads,
                             method=FormulaDecoder.build_memory)

    two = lambda x: jnp.concatenate([x, x], axis=0)
    gmask = jnp.concatenate([jnp.ones((b,), bool), jnp.zeros((b,), bool)])
    both = _rollout(decoder, fvars, two(fz), two(fstoich), two(fheads),
                    s_rng, cfg, luts, greedy=False, temperature=temperature,
                    memory=two(f_memory), greedy_mask=gmask)
    tokens2 = _pad_to(both['tokens'], t, 0)
    mask2 = _pad_to(both['mask'], t, 0.0)
    # rewards per half: the novelty bonus is batch-relative, so the greedy
    # twins must not count as neighbours of the sampled rows
    g_reward = jax.lax.stop_gradient(
        _total_reward(tokens2[:b], targets, mask2[:b], cfg, luts,
                      family_predictions))
    s_tokens = tokens2[b:]
    s_mask = mask2[b:]
    s_ent = _pad_to(both['entropy'], t, 0.0)[b:]
    s_reward = jax.lax.stop_gradient(
        _total_reward(s_tokens, targets, s_mask, cfg, luts,
                      family_predictions))

    # differentiable log pi(sampled) via one parallel TF pass (rematerialised
    # in backward: residuals are just its inputs)
    s_logp = jax.checkpoint(
        lambda v, zz, st, hv: rescore_log_probs(
            decoder, v, zz, st, hv, s_tokens, cfg, luts,
            temperature=temperature))(variables, z, stoich, heads_vec)

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

    fvars, fz, fstoich, fheads = _frozen_rollout_inputs(
        variables, z_k, stoich_k, heads_k)
    sample = _rollout(decoder, fvars, fz, fstoich, fheads, rng,
                      cfg, luts, greedy=False, temperature=temperature)
    s_tokens = _pad_to(sample['tokens'], t, 0)
    s_mask = _pad_to(sample['mask'], t, 0.0)
    s_ent = _pad_to(sample['entropy'], t, 0.0)
    s_logp = jax.checkpoint(
        lambda v, zz, st, hv: rescore_log_probs(
            decoder, v, zz, st, hv, s_tokens, cfg, luts,
            temperature=temperature))(variables, z_k, stoich_k, heads_k)

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
