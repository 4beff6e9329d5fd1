"""Exact Hungarian assignment IN-JIT via subset dynamic programming.

The reference calls scipy ``linear_sum_assignment`` on the host per sample
(reference: src/superconductor/losses/hungarian_loss.py:23-120).  On TPU a
host callback would serialize the step, so we solve the 12x12 assignment
exactly on device with bitmask DP:

    dp[S] = min_{j in S} dp[S \\ {j}] + cost[|S|-1, j]

O(n * 2^n) = 49k fused ops for n=12 — microseconds on the VPU — and it
vmaps over the batch.  Backtracking the argmin pointers recovers the
permutation for target gathering.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9


@functools.lru_cache(maxsize=None)
def _popcounts(n: int) -> np.ndarray:
    return np.array([bin(s).count('1') for s in range(1 << n)], np.int32)


@functools.lru_cache(maxsize=None)
def _level_tables(n: int):
    """Static per-popcount-level tables for a SCATTER-FREE DP.

    For level k (1-indexed): the subset ids, the RANK (index within level
    k-1's array) of each predecessor S \\ {j}, and the j-in-S mask.  Also a
    global [2^n] subset-id -> (level, rank) table for backtracking.  All
    lookups in the DP become gathers — no scatters, which the experimental
    axon TPU runtime has crashed on.
    """
    pops = _popcounts(n)
    size = 1 << n
    rank = np.zeros(size, np.int32)
    for k in range(0, n + 1):
        ids = np.where(pops == k)[0]
        rank[ids] = np.arange(len(ids), dtype=np.int32)

    levels = []
    for k in range(1, n + 1):
        subsets = np.where(pops == k)[0].astype(np.int32)          # [M_k]
        preds = subsets[:, None] ^ (1 << np.arange(n))[None, :]    # [M_k, n]
        in_s = (subsets[:, None] & (1 << np.arange(n))[None, :]) > 0
        pred_rank = rank[preds].astype(np.int32)                   # [M_k, n]
        levels.append((subsets, pred_rank, in_s))
    return levels, rank


def hungarian_assignment(cost: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact min-cost perfect matching on an [n, n] cost matrix.

    Bitmask subset DP, vectorized per popcount level (n sequential level
    updates covering all 2^n states) and built entirely from gathers over
    per-level arrays.  Returns (row_to_col [n] int32, total_cost scalar);
    row i is the i-th assigned (DP cardinality order == row order).
    """
    n = cost.shape[0]
    levels, rank = _level_tables(n)

    dp_prev = jnp.zeros((1,), cost.dtype)          # level 0: empty set
    dp_levels = []                                  # per-level parent argmins
    parents = []
    for k, (subsets, pred_rank, in_s) in enumerate(levels):
        cand = jnp.where(jnp.asarray(in_s),
                         dp_prev[jnp.asarray(pred_rank)] + cost[k, :][None, :],
                         _BIG)                                     # [M_k, n]
        j = jnp.argmin(cand, axis=1).astype(jnp.int32)
        dp_prev = jnp.min(cand, axis=1)
        dp_levels.append(dp_prev)
        parents.append(j)

    # backtrack: one subset per level, resolved via the static rank table
    rank_t = jnp.asarray(rank)
    perm0 = jnp.zeros(n, jnp.int32)
    s = jnp.int32((1 << n) - 1)
    for k in range(n - 1, -1, -1):
        j = parents[k][rank_t[s]]
        perm0 = perm0.at[k].set(j)                  # static index: no scatter op
        s = s ^ (jnp.int32(1) << j)
    return perm0, dp_levels[-1][0]


batched_hungarian = jax.vmap(hungarian_assignment)


def hungarian_matching_loss(
    element_logits: jnp.ndarray,   # [B, S, 119] class 0 = empty
    fraction_pred: jnp.ndarray,    # [B, S]
    presence_logits: jnp.ndarray,  # [B, S]
    gt_elements: jnp.ndarray,      # [B, E] atomic numbers (0 = pad)
    gt_fractions: jnp.ndarray,     # [B, E]
    gt_mask: jnp.ndarray,          # [B, E]
    element_weight: float = 1.0,
    fraction_weight: float = 5.0,
    no_object_weight: float = 0.1,
    presence_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Set-prediction loss with exact on-device matching
    (reference semantics: losses/hungarian_loss.py:32-268)."""
    b, s, _ = element_logits.shape
    logp = jax.nn.log_softmax(element_logits.astype(jnp.float32), axis=-1)
    gt_e = jnp.clip(gt_elements, 0, 118)
    valid = gt_mask.astype(jnp.float32)

    # cost[b, slot, gt_col]: element CE + weighted fraction MSE for real
    # columns; a large CONSTANT for padded columns (constant column cost does
    # not change the optimal assignment of real columns)
    # gather CE of each gt element per slot: [B, S, E]
    ce = -logp[jnp.arange(b)[:, None, None],
               jnp.arange(s)[None, :, None],
               gt_e[:, None, :]]
    frac_err = (fraction_pred[:, :, None] - gt_fractions[:, None, :]) ** 2
    cost = element_weight * ce + fraction_weight * frac_err
    cost = jnp.where(valid[:, None, :] > 0, cost, 1e4)

    # match slots (rows) to gt columns; row order == slot order because we
    # permute the COST so that DP row i corresponds to slot i
    perm, _ = batched_hungarian(cost)                # [B, S] slot -> gt col

    matched_e = jnp.take_along_axis(gt_e, perm, axis=1)          # [B, S]
    matched_f = jnp.take_along_axis(gt_fractions, perm, axis=1)
    matched_real = jnp.take_along_axis(valid, perm, axis=1)      # 1 if real

    # element CE: real targets at weight 1, empty (class 0) downweighted
    tgt = jnp.where(matched_real > 0, matched_e, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = jnp.where(matched_real > 0, 1.0, no_object_weight)
    element_loss = (nll * w).sum() / jnp.clip(w.sum(), 1.0)

    frac_l = ((fraction_pred - matched_f) ** 2 * matched_real).sum() \
        / jnp.clip(matched_real.sum(), 1.0)

    pres_logits = presence_logits.astype(jnp.float32)
    pres_bce = -(matched_real * jax.nn.log_sigmoid(pres_logits)
                 + (1 - matched_real) * jax.nn.log_sigmoid(-pres_logits))
    presence_loss = pres_bce.mean()

    total = (element_weight * element_loss + fraction_weight * frac_l
             + presence_weight * presence_loss)

    pred_e = jnp.argmax(element_logits, axis=-1)
    elem_correct = ((pred_e == matched_e) * matched_real).sum() \
        / jnp.clip(matched_real.sum(), 1.0)
    set_exact = (((pred_e == tgt) | (matched_real == 0))
                 & ((jax.nn.sigmoid(pres_logits) > 0.5) == (matched_real > 0))
                 ).all(axis=1).astype(jnp.float32).mean()

    return {
        'total': total, 'element_loss': element_loss,
        'fraction_loss': frac_l, 'presence_loss': presence_loss,
        'element_accuracy': elem_correct, 'set_exact': set_exact,
    }
