"""Auxiliary representation losses: SupCon contrastive + consistency.

Capability parity with the reference's contrastive-era aux losses, both of
which ship at weight 0 in the reference's active V14.3 config but remain part
of its loss surface (SURVEY §2.4):

  - Supervised contrastive (SupCon, Khosla et al. 2020) over encoder latents
    (reference: src/superconductor/losses/contrastive.py:33-88) — pushes
    same-class latents together / different-class apart on the unit
    hypersphere with temperature scaling.  The companion
    ``category_to_label`` family-label mapping is already ported in
    ``data/pipeline.py`` (it feeds the active family head).
  - Self-consistency: properties predicted from the ORIGINAL input must match
    properties re-predicted from the reconstruction's latent
    (reference: src/superconductor/losses/consistency_losses.py:38-107).
  - Bidirectional consistency: Tc predicted through the full
    encode→decode→re-encode loop must match the ground truth
    (reference: src/superconductor/losses/consistency_losses.py:110-200).

TPU-first notes: all three are single fused jnp expressions (no host sync, no
dynamic shapes); SupCon's "no positives in batch" guard is a ``jnp.where``
instead of the reference's float multiply so a fully-degenerate batch still
produces a finite 0 loss under jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def supcon_loss(z: jnp.ndarray, labels: jnp.ndarray,
                temperature: float = 0.07,
                base_temperature: float = 0.07) -> jnp.ndarray:
    """Supervised contrastive loss over latents.

    z: [B, D] latent vectors; labels: [B] integer class labels.  Positives =
    same label (self excluded); all non-self pairs are contrast candidates.
    Returns a scalar (0.0 for B<=1 — static-shape guard, matching the
    reference's early return at contrastive.py:52-53).
    """
    b = z.shape[0]
    if b <= 1:
        return jnp.asarray(0.0, z.dtype)
    zn = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    sim = (zn @ zn.T) / temperature                       # [B, B]
    eye = jnp.eye(b, dtype=bool)
    pos_mask = (labels[:, None] == labels[None, :]) & ~eye
    # row-max subtraction for numerical stability (stop-gradient is implicit:
    # max is piecewise-constant almost everywhere)
    sim = sim - jnp.max(sim, axis=1, keepdims=True)
    exp_sim = jnp.where(eye, 0.0, jnp.exp(sim))
    log_prob = sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + 1e-8)
    pos_count = jnp.sum(pos_mask, axis=1)
    mean_log_prob = (jnp.sum(jnp.where(pos_mask, log_prob, 0.0), axis=1)
                     / jnp.maximum(pos_count, 1))
    mean_log_prob = jnp.where(pos_count > 0, mean_log_prob, 0.0)
    return jnp.mean(-(temperature / base_temperature) * mean_log_prob)


def self_consistency_loss(
    original_tc: jnp.ndarray, reconstructed_tc: jnp.ndarray,
    original_magpie: Optional[jnp.ndarray] = None,
    reconstructed_magpie: Optional[jnp.ndarray] = None,
    tc_weight: float = 1.0, magpie_weight: float = 0.1,
    normalize_magpie: bool = True, huber_delta: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Original-vs-reconstructed property agreement.

    ``huber_delta=None`` selects MSE (the reference default
    ``use_huber=False``); a float selects Huber with that delta.
    Returns {'tc_consistency', 'magpie_consistency', 'total'}.
    """
    o = original_tc.reshape(-1)
    r = reconstructed_tc.reshape(-1)
    if huber_delta is None:
        tc_loss = jnp.mean((r - o) ** 2)
    else:
        err = jnp.abs(r - o)
        tc_loss = jnp.mean(jnp.where(
            err <= huber_delta, 0.5 * err ** 2,
            huber_delta * (err - 0.5 * huber_delta)))
    tc_loss = tc_loss * tc_weight
    if original_magpie is not None and reconstructed_magpie is not None:
        om, rm = original_magpie, reconstructed_magpie
        if normalize_magpie:
            om = om / jnp.maximum(
                jnp.linalg.norm(om, axis=-1, keepdims=True), 1e-12)
            rm = rm / jnp.maximum(
                jnp.linalg.norm(rm, axis=-1, keepdims=True), 1e-12)
        magpie_loss = jnp.mean((rm - om) ** 2) * magpie_weight
    else:
        magpie_loss = jnp.asarray(0.0, tc_loss.dtype)
    return {'tc_consistency': tc_loss, 'magpie_consistency': magpie_loss,
            'total': tc_loss + magpie_loss}


def bidirectional_consistency_loss(
    original_tc: jnp.ndarray, pred_tc_from_reconstruction: jnp.ndarray,
    tc_weight: float = 1.0, huber_delta: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Full-loop Tc agreement: ground truth vs Tc re-predicted from the
    decoded formula's re-encoding.  The caller supplies the re-predicted Tc
    (in this framework the round-trip machinery in ``ops/round_trip.py``
    produces it on-device; the reference's optional frozen tc_predictor is a
    host-side convenience it never ships a weight file for).
    Returns {'bidirectional_consistency', 'tc_error_mean', 'tc_error_std'}.
    """
    o = original_tc.reshape(-1)
    p = pred_tc_from_reconstruction.reshape(-1)
    err = jnp.abs(o - p)
    if huber_delta is None:
        loss = jnp.mean((p - o) ** 2)
    else:
        loss = jnp.mean(jnp.where(
            err <= huber_delta, 0.5 * err ** 2,
            huber_delta * (err - 0.5 * huber_delta)))
    std = jnp.std(err, ddof=1) if err.shape[0] > 1 else jnp.asarray(0.0)
    return {'bidirectional_consistency': loss * tc_weight,
            'tc_error_mean': jnp.mean(err), 'tc_error_std': std}
