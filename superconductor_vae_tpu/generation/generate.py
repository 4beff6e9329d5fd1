"""Batched autoregressive generation with a fixed-shape KV cache, in-jit.

Re-designs the reference's per-step Python generation loop
(reference: autoregressive_decoder.py:1321-1557 ``generate_with_kv_cache``)
as one ``lax.scan`` program: every per-step Python branch — token-type hard
masking, site-duplication gating, stop-head boost, hard-stop forcing,
length-conditional boost, NaN/Inf logit guards, temperature / top-k / top-p —
becomes a ``jnp.where`` chain over the whole batch.  The entire rollout
(29 steps x 12 layers) compiles to a single XLA program; sampling uses
``jax.random.categorical`` with per-step folded keys.

There is no early-exit when all sequences finish: with batch-parallel rollout
on TPU the fixed 29-step scan is cheaper than a dynamic ``while_loop`` with
divergent exit (and keeps shapes static for the compiler).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..tokenizer import (
    BOS_ID, EOS_ID, ELEMENT_TOKEN_START, INTEGER_TOKEN_START,
)


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Static generation knobs (trace-time constants)."""
    max_len: int = 30
    temperature: float = 1.0
    top_k: int = 0                   # 0 = disabled
    top_p: float = 1.0               # 1.0 = disabled
    stop_boost: float = 0.0
    hard_stop_threshold: float = 0.0
    site_dup_threshold: float = 0.0
    use_type_masking: bool = False
    length_boost_start: int = 10
    length_boost_scale: float = 10.0
    # stop the rollout once every row has emitted EOS (lax.while_loop).
    # Token-identical to the fixed scan up to each row's first EOS (the
    # dead post-EOS positions are left 0 instead of garbage-sampled).
    # Forward-only: reverse-mode cannot cross a while_loop, so callers
    # that differentiate through the rollout (round-trip loss, Phase-2)
    # must keep the scan.  Pays off when the batch's longest formula is
    # well under max_len — a trained model finishes in ~15-22 of the 29
    # steps.
    early_exit: bool = False

    @property
    def greedy(self) -> bool:
        return self.temperature < 0.01


def _apply_gates(logits, heads, pos, finished, seen_elements, type_masks, gcfg):
    """The reference's per-step gating stack as pure array ops."""
    neg_inf = jnp.finfo(logits.dtype).min

    # V14.3 hard type masking: predicted type -> only tokens of that type
    if gcfg.use_type_masking and type_masks is not None:
        ptype = jnp.argmax(heads['type_logits'], axis=-1)          # [B]
        valid = type_masks[ptype]                                  # [B, V]
        logits = jnp.where(valid, logits, neg_inf)

    # V15.x site-duplication gating: suppress already-seen elements unless the
    # dup head clears the threshold. Soft suppress (-30) like the reference.
    # (Deviation: the reference checks the stale V12 element id range 20-137
    # against the V13 vocab — autoregressive_decoder.py:1529; we use the
    # correct V13 range.)
    if gcfg.site_dup_threshold > 0:
        dup_prob = jax.nn.sigmoid(heads['site_dup_logits'])        # [B]
        suppress = (dup_prob < gcfg.site_dup_threshold) & (pos > 0)
        combined = suppress[:, None] & seen_elements
        logits = jnp.where(combined, jnp.asarray(-30.0, logits.dtype), logits)

    # V12.30/V12.37 stop machinery
    if gcfg.stop_boost > 0:
        stop_prob = jax.nn.sigmoid(heads['stop_logits'])           # [B]
        boost = gcfg.stop_boost * stop_prob
        length_boost = jnp.where(
            pos > gcfg.length_boost_start,
            gcfg.length_boost_scale * (pos - gcfg.length_boost_start)
            / max(gcfg.max_len - gcfg.length_boost_start, 1),
            0.0,
        ).astype(logits.dtype)
        eos_bump = (boost + length_boost)[:, None]
        eos_onehot = jnp.zeros_like(logits).at[:, EOS_ID].set(1.0)
        logits = logits + eos_onehot * eos_bump

        if gcfg.hard_stop_threshold > 0:
            force = (stop_prob > gcfg.hard_stop_threshold) & (~finished)
            forced = jnp.full_like(logits, neg_inf).at[:, EOS_ID].set(100.0)
            logits = jnp.where(force[:, None], forced, logits)

    return logits


def _filter_top_k_top_p(logits, gcfg):
    neg_inf = jnp.finfo(logits.dtype).min
    if gcfg.top_k and gcfg.top_k > 0:
        kth = jax.lax.top_k(logits, gcfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, neg_inf, logits)
    if gcfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # keep tokens whose prefix-exclusive cumulative prob < top_p (always
        # keep the top-1)
        cutoff_mask = cum - jax.nn.softmax(sorted_logits, axis=-1) >= gcfg.top_p
        cutoff_mask = cutoff_mask.at[:, 0].set(False)
        # threshold logit value at the cutoff boundary
        kept = jnp.where(cutoff_mask, neg_inf, sorted_logits)
        min_kept = jnp.min(jnp.where(cutoff_mask, jnp.inf, sorted_logits),
                           axis=-1, keepdims=True)
        logits = jnp.where(logits < min_kept, neg_inf, logits)
        del kept
    return logits


def generate_with_kv_cache(
    decoder,                 # FormulaDecoder module
    variables,               # decoder params
    z: jnp.ndarray,
    stoich: jnp.ndarray,
    heads_vec: jnp.ndarray,
    rng: jax.Array,
    gcfg: GenerationConfig,
    type_masks: Optional[jnp.ndarray] = None,   # [5, V] bool
    memory: Optional[jnp.ndarray] = None,
    temperature: Optional[jnp.ndarray] = None,  # traced override (no recompile)
    greedy_mask: Optional[jnp.ndarray] = None,  # [B] bool: per-row argmax
) -> Dict[str, jnp.ndarray]:
    """Batched AR rollout. Returns tokens/log_probs/entropy/mask, each
    [B, max_len - 1] (token stream excludes the BOS input, as in the
    reference).

    ``greedy_mask`` selects argmax per ROW inside a sampling rollout (their
    log_probs are 0, like a greedy rollout's): SCST fuses its greedy
    baseline and its sampled rollout into ONE [2B] rollout — the decode
    steps are latency-bound, so one double-batch scan costs far less than
    two sequential scans."""
    from ..models.decoder import FormulaDecoder  # avoid cycle

    b = z.shape[0]
    vocab = decoder.cfg.vocab_size
    steps = gcfg.max_len - 1

    if memory is None:
        memory = decoder.apply(variables, z, stoich, heads_vec,
                               method=FormulaDecoder.build_memory)
    mem_kvs = decoder.apply(variables, memory, method=FormulaDecoder.memory_kv)
    k0, v0 = decoder.apply(variables, b, method=FormulaDecoder.init_cache)

    init = (
        jnp.full((b,), BOS_ID, dtype=jnp.int32),        # current input token
        jnp.zeros((b,), dtype=bool),                     # finished
        k0, v0,
        jnp.zeros((b, vocab), dtype=bool),               # seen element tokens
    )

    def body(carry, pos):
        tok, finished, kc, vc, seen = carry
        heads, kc, vc = decoder.apply(
            variables, tok, pos, kc, vc, mem_kvs,
            method=FormulaDecoder.decode_step)
        logits = heads['logits'].astype(jnp.float32)     # [B, V]

        logits = _apply_gates(logits, heads, pos, finished, seen,
                              type_masks, gcfg)

        # NaN/Inf guard: degenerate rows fall back to uniform
        # (reference: autoregressive_decoder.py:1459-1518)
        degenerate = ~jnp.isfinite(logits).any(axis=-1) | jnp.isnan(logits).any(axis=-1)
        safe_logits = jnp.where(degenerate[:, None], jnp.zeros_like(logits), logits)

        # proper entropy BEFORE temperature/filtering
        probs_ent = jnp.clip(jax.nn.softmax(safe_logits, axis=-1), 1e-8)
        entropy = -(probs_ent * jnp.log(probs_ent)).sum(axis=-1)
        entropy = jnp.where(degenerate, jnp.log(float(vocab)), entropy)

        if gcfg.greedy:
            next_tok = jnp.argmax(safe_logits, axis=-1).astype(jnp.int32)
            log_prob = jnp.zeros((b,), jnp.float32)
        else:
            temp = gcfg.temperature if temperature is None else temperature
            t_logits = safe_logits / temp
            t_logits = _filter_top_k_top_p(t_logits, gcfg)
            t_logits = jnp.where(degenerate[:, None],
                                 jnp.zeros_like(t_logits), t_logits)
            step_rng = jax.random.fold_in(rng, pos)
            next_tok = jax.random.categorical(step_rng, t_logits).astype(jnp.int32)
            probs = jnp.clip(jax.nn.softmax(t_logits, axis=-1), 1e-8)
            log_prob = jnp.log(probs)[jnp.arange(b), next_tok]
            if greedy_mask is not None:
                next_tok = jnp.where(
                    greedy_mask,
                    jnp.argmax(safe_logits, axis=-1).astype(jnp.int32),
                    next_tok)
                log_prob = jnp.where(greedy_mask, 0.0, log_prob)

        # track seen element tokens (correct V13 element range)
        is_elem = ((next_tok >= ELEMENT_TOKEN_START)
                   & (next_tok < INTEGER_TOKEN_START) & (~finished))
        seen = seen.at[jnp.arange(b), next_tok].set(
            seen[jnp.arange(b), next_tok] | is_elem)

        finished = finished | (next_tok == EOS_ID)
        return (next_tok, finished, kc, vc, seen), (next_tok, log_prob, entropy)

    if gcfg.early_exit:
        tok_buf = jnp.zeros((b, steps), jnp.int32)
        lp_buf = jnp.zeros((b, steps), jnp.float32)
        ent_buf = jnp.zeros((b, steps), jnp.float32)

        def cond(state):
            pos, carry, _ = state
            finished = carry[1]
            return (pos < steps) & ~finished.all()

        def wbody(state):
            pos, carry, bufs = state
            carry, (tok, lp, ent) = body(carry, pos)
            tb, lb, eb = bufs
            bufs = (tb.at[:, pos].set(tok), lb.at[:, pos].set(lp),
                    eb.at[:, pos].set(ent))
            return pos + 1, carry, bufs

        _, _, (tokens, log_probs, entropies) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), init, (tok_buf, lp_buf, ent_buf)))
    else:
        # remat the decode step: some callers (round-trip loss, Phase-2)
        # differentiate through the rollout, and without checkpointing the
        # backward pass stores every step's full decoder activations (OOMs
        # HBM at batch 128 on the 108M model — 26G > 16G).  Recomputing the
        # step in backward keeps only the scan carries.  Forward-only
        # generation is unaffected.
        _, (tokens, log_probs, entropies) = jax.lax.scan(
            jax.checkpoint(body), init, jnp.arange(steps))
        tokens = tokens.T               # [steps, B] -> [B, steps]
        log_probs = log_probs.T
        entropies = entropies.T
    mask = sequence_mask(tokens)
    return {'tokens': tokens, 'log_probs': log_probs,
            'entropy': entropies, 'mask': mask}


def sequence_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    """1.0 for positions up to and including the first EOS, else 0.0
    (reference: autoregressive_decoder.py:1620-1640)."""
    seq_len = tokens.shape[1]
    is_end = tokens == EOS_ID
    end_pos = jnp.argmax(is_end.astype(jnp.int32), axis=1)
    has_end = is_end.any(axis=1)
    end_pos = jnp.where(has_end, end_pos, seq_len)
    positions = jnp.arange(seq_len)[None, :]
    return (positions <= end_pos[:, None]).astype(jnp.float32)


def sample_for_reinforce(decoder, variables, z, stoich, heads_vec, rng, gcfg,
                         type_masks=None, memory=None):
    """RL sampling wrapper: returns (tokens, log_probs, entropy, mask)."""
    out = generate_with_kv_cache(decoder, variables, z, stoich, heads_vec,
                                 rng, gcfg, type_masks=type_masks, memory=memory)
    return out['tokens'], out['log_probs'], out['entropy'], out['mask']
