"""Speculative decoding: n-gram draft + chunked cached verification.

Capability parity with the reference's speculative path
(reference: autoregressive_decoder.py:1643-1984
``speculative_sample_for_reinforce`` and models/speculative_decoder.py;
the reference built it, measured 1-4% draft acceptance, and disabled it —
train_v12_clean.py:646-653.  It ships here as a first-class, measured
alternative because on TPU the verification cost model is different: a
k-token chunk forward costs barely more than a single-token step, so even
modest acceptance rates win wall-clock.)

Algorithm (greedy speculative decoding):
  1. draft k tokens by chaining the bigram LUT
  2. ONE chunk forward verifies all k against the model argmax
  3. accept the longest agreeing prefix + the model's own next token
  4. advance the shared cache pointer by min-over-batch(accepted + 1)
     (rows that accepted more simply re-verify those tokens next round —
     the greedy model is deterministic, so re-verification is lossless)

Fixed shapes throughout: the outer loop is a lax.scan; rejected cache rows
are masked by the position pointer and overwritten by later chunks.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..tokenizer import BOS_ID, EOS_ID
from .generate import sequence_mask


def speculative_generate(
    decoder, variables,
    z: jnp.ndarray, stoich: jnp.ndarray, heads_vec: jnp.ndarray,
    draft_table: jnp.ndarray,          # [V] next-token LUT
    max_len: Optional[int] = None,
    k: int = 4,
) -> Dict[str, jnp.ndarray]:
    """Greedy speculative decode. Returns {'tokens', 'mask',
    'acceptance_rate'} with tokens [B, max_len-1]."""
    from ..models.decoder import FormulaDecoder

    cfg = decoder.cfg
    max_len = max_len or cfg.max_len
    steps = max_len - 1
    b = z.shape[0]
    chunk = k + 1
    # worst case the pointer advances 1/iteration
    n_outer = steps

    memory = decoder.apply(variables, z, stoich, heads_vec,
                           method=FormulaDecoder.build_memory)
    mem_kvs = decoder.apply(variables, memory, method=FormulaDecoder.memory_kv)
    # cache slack so a chunk starting at the last position never clips
    kc, vc = decoder.apply(variables, b, chunk,
                           method=FormulaDecoder.init_cache)

    # output buffer padded so chunk writes never clip
    out0 = jnp.zeros((b, steps + chunk), jnp.int32)

    def body(carry, _):
        cur, pos, finished, kc, vc, out, acc_n, draft_n = carry
        done = pos >= steps

        # 1. chain-draft k tokens
        def draft_step(tok, _):
            nxt = draft_table[tok]
            return nxt, nxt
        _, drafts = jax.lax.scan(draft_step, cur, None, length=k)
        drafts = drafts.T                                          # [B, k]
        chunk_in = jnp.concatenate([cur[:, None], drafts], axis=1)  # [B, k+1]

        # 2. verify with one cached chunk forward (clamp pos for the write)
        safe_pos = jnp.minimum(pos, steps - 1)
        heads, kc_new, vc_new = decoder.apply(
            variables, chunk_in, safe_pos, kc, vc, mem_kvs,
            method=FormulaDecoder.decode_chunk)
        model_next = jnp.argmax(heads['logits'], axis=-1).astype(jnp.int32)

        # 3. longest agreeing draft prefix per row
        agree = drafts == model_next[:, :k]
        prefix_ok = jnp.cumprod(agree.astype(jnp.int32), axis=1)
        n_acc = prefix_ok.sum(axis=1)                              # [B] 0..k

        positions = jnp.arange(chunk)[None, :]
        drafts_p = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), drafts.dtype)], axis=1)     # [B, k+1]
        emitted = jnp.where(positions < n_acc[:, None], drafts_p, 0)
        bonus = jnp.take_along_axis(model_next, n_acc[:, None], axis=1)[:, 0]
        emitted = emitted.at[jnp.arange(b), n_acc].set(bonus)
        n_emit = n_acc + 1
        valid = positions < n_emit[:, None]
        emitted = jnp.where(finished[:, None] | done, 0, emitted * valid)

        out = jax.lax.dynamic_update_slice_in_dim(out, emitted, safe_pos,
                                                  axis=1)

        # 4. batch-uniform advance = min over unfinished rows of n_emit
        adv = jnp.min(jnp.where(finished | done, chunk, n_emit))
        adv = jnp.clip(adv, 1, chunk)

        # a row is finished only when EOS lands in the COMMITTED region
        # (< adv): tokens beyond the batch-min advance are uncommitted and
        # get re-verified (and re-written) next iteration — marking them
        # finished would zero the next chunk's write over the EOS itself,
        # silently truncating the row
        hit_end = ((emitted == EOS_ID) & valid & (positions < adv)).any(axis=1)
        cat = jnp.concatenate([cur[:, None], emitted], axis=1)     # [B, k+2]
        new_cur = jnp.take(cat, adv, axis=1)                       # [B]
        new_cur = jnp.where(finished, cur, new_cur)

        acc_n = acc_n + jnp.where(done, 0, jnp.sum(
            jnp.where(finished, 0, jnp.minimum(n_acc, adv))))
        draft_n = draft_n + jnp.where(done, 0, jnp.sum(
            jnp.where(finished, 0, jnp.minimum(k, adv))))

        finished = finished | hit_end
        new_pos = jnp.where(done, pos, pos + adv)
        return ((new_cur, new_pos, finished, kc_new, vc_new, out,
                 acc_n, draft_n), None)

    init = (jnp.full((b,), BOS_ID, jnp.int32), jnp.int32(0),
            jnp.zeros((b,), bool), kc, vc, out0,
            jnp.int32(0), jnp.int32(0))
    (cur, pos, finished, kc, vc, out, acc, drafted), _ = jax.lax.scan(
        body, init, None, length=n_outer)

    tokens = out[:, :steps]
    return {
        'tokens': tokens,
        'mask': sequence_mask(tokens),
        'acceptance_rate': acc / jnp.clip(drafted, 1),
    }
