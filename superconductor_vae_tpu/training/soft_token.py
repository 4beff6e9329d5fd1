"""Soft-token scheduled sampling — differentiable exposure-bias training.

TPU-native port of the reference's SoftTokenScheduler / SoftTokenMixer /
SoftTokenDecoder (reference: training/soft_token_sampling.py:44-391).
Instead of hard scheduled sampling (sample a discrete token, breaking
differentiability), the decoder's second pass is fed a mixture of

    hard  = E[target_token]                      (teacher forcing)
    soft  = softmax(first_pass_logits / T) @ E   (expected embedding)

with ``mixed = (1 - r) * hard + r * soft``.  Gradients flow through the
second pass only — the first (teacher-forced) pass is stop-gradiented,
matching the reference's ``torch.no_grad()`` first pass
(soft_token_sampling.py:317-319).

Everything here is jit-friendly: the ratio is a traced scalar, both
passes are fixed-shape, and the mixer is two matmuls.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ['SoftTokenSchedule', 'soft_token_ratio', 'mix_embeddings',
           'soft_token_forward']


@dataclass(frozen=True)
class SoftTokenSchedule:
    """Ratio schedule (reference: soft_token_sampling.py:44-108).

    start_ratio until ``warmup_epochs``, then ramps to ``end_ratio``
    over the remaining epochs by the chosen shape.
    """
    n_epochs: int = 300
    start_ratio: float = 0.0
    end_ratio: float = 0.5
    warmup_epochs: int = 0
    schedule: str = 'linear'  # 'linear' | 'cosine' | 'exponential'


def soft_token_ratio(epoch: int, cfg: SoftTokenSchedule) -> float:
    """Host-side per-epoch ratio (a controller decision, not device code)."""
    if epoch < cfg.warmup_epochs:
        return cfg.start_ratio
    effective = max(1, cfg.n_epochs - cfg.warmup_epochs)
    p = min(1.0, (epoch - cfg.warmup_epochs) / effective)
    if cfg.schedule == 'linear':
        shaped = p
    elif cfg.schedule == 'cosine':
        shaped = 0.5 * (1.0 - math.cos(math.pi * p))
    elif cfg.schedule == 'exponential':
        shaped = (math.exp(p) - 1.0) / (math.e - 1.0)
    else:
        raise ValueError(f'unknown soft-token schedule: {cfg.schedule}')
    return cfg.start_ratio + shaped * (cfg.end_ratio - cfg.start_ratio)


def mix_embeddings(hard: jnp.ndarray, soft: jnp.ndarray,
                   soft_ratio, position_mask=None) -> jnp.ndarray:
    """(1-r)*hard + r*soft, optionally restricted to masked positions
    (reference: soft_token_sampling.py:176-228 mix_embeddings)."""
    r = jnp.asarray(soft_ratio, hard.dtype)
    if position_mask is not None:
        soft = jnp.where(position_mask[..., None], soft, hard)
    return hard * (1.0 - r) + soft * r


def soft_token_forward(decoder, dec_params, z, target_tokens, stoich,
                       heads_vec, soft_ratio, temperature: float = 1.0,
                       position_mask=None, rngs=None,
                       deterministic: bool = True):
    """Two-pass soft-token forward (reference: soft_token_sampling.py:264-360).

    Pass 1: ordinary teacher-forced forward (stop-gradient).
    Pass 2: forward over mixed embeddings.  Position 0 (BOS) is always
    hard; position j>0 mixes in softmax(logits[j-1]/T) @ E — the first
    pass's prediction FOR position j.

    ``soft_ratio`` may be a traced scalar so one compiled program covers
    the whole ramp.  Returns the pass-2 heads dict (same contract as
    ``decoder.__call__``).
    """
    from ..models.decoder import FormulaDecoder

    kw = dict(deterministic=deterministic)
    if rngs is not None:
        kw['rngs'] = rngs
    first = decoder.apply(dec_params, z, target_tokens, stoich, heads_vec,
                          **kw)
    logits = jax.lax.stop_gradient(first['logits'])          # [B, T-1, V]
    memory = jax.lax.stop_gradient(first['memory'])

    inputs = target_tokens[:, :-1]                            # [B, T-1]
    hard = decoder.apply(dec_params, inputs,
                         method=FormulaDecoder.embed_hard)    # [B, T-1, d]
    probs = jax.nn.softmax(
        logits[:, :-1].astype(jnp.float32) / max(temperature, 1e-6), axis=-1
    ).astype(hard.dtype)                                      # [B, T-2, V]
    soft_body = decoder.apply(dec_params, probs,
                              method=FormulaDecoder.embed_soft)
    soft = jnp.concatenate([hard[:, :1], soft_body], axis=1)  # BOS stays hard
    mixed = mix_embeddings(hard, soft, soft_ratio,
                           position_mask=position_mask)

    # memory is re-derived from z with gradients ON in pass 2 so encoder
    # conditioning still trains; only pass-1 logits are detached
    mem2 = decoder.apply(dec_params, z, stoich, heads_vec,
                         method=FormulaDecoder.build_memory)
    del memory
    return decoder.apply(dec_params, mixed, mem2,
                         method=FormulaDecoder.forward_embeds, **kw)
