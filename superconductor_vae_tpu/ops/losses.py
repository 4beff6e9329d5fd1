"""17-term multi-task loss, assembled in a single jitted pass.

Capability parity with the reference's ``CombinedLossWithREINFORCE`` plus the
external losses its train_epoch adds
(reference: scripts/train_v12_clean.py:2371-3354 and :5303-5700):

  formula focal CE (+ length / element-count per-sample weights), SCST/RLOO
  policy gradient (ops/rl.py), Tc Huber + asymmetric + Kelvin-weighted +
  relative-blend + binned, Tc-bucket CE, Magpie MSE, masked stoich MSE +
  count MSE, z-L2 ("kl_loss"), z-norm penalty, stop BCE, token-type CE,
  site-dup BCE, HP BCE, SC BCE, hierarchical family CE, constraint zoo
  A3/A6.

TPU-first redesign: the reference splits mixed SC/non-SC batches into two
loss_fn invocations and recombines by subset fraction
(train_v12_clean.py:5604-5700).  Mathematically that equals ONE pass with
per-sample weights (1.0 for SC rows, ``non_sc_formula_weight`` for non-SC
rows on the formula term; SC-indicator masking on Tc/Magpie/stoich terms) —
which is how it is computed here, halving compile paths and keeping a single
static-shape program.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..tokenizer import PAD_ID, EOS_ID, FRACTION_TOKEN_START
from ..models.family_classifier import (
    FINE_TO_COARSE, FINE_TO_CUPRATE_SUB, FINE_TO_IRON_SUB,
)
from .token_stats import is_element_token
from .constraints import site_occupancy_loss, charge_balance_loss


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights and shapes (reference defaults: TRAIN_CONFIG,
    train_v12_clean.py:408-1087)."""
    ce_weight: float = 1.0
    rl_weight: float = 0.0
    tc_weight: float = 20.0
    magpie_weight: float = 2.0
    kl_weight: float = 1e-4
    stoich_weight: float = 2.0
    element_count_weight: float = 0.5
    tc_class_weight: float = 1.0
    hp_loss_weight: float = 1.0
    sc_loss_weight: float = 1.0
    stop_loss_weight: float = 5.0
    stop_end_position_weight: float = 10.0
    token_type_loss_weight: float = 1.0
    site_dup_loss_weight: float = 1.0
    site_dup_pos_weight: float = 800.0
    family_loss_weight: float = 0.5
    family_coarse_weight: float = 0.6
    family_cuprate_weight: float = 0.3
    family_iron_weight: float = 0.1
    constraint_zoo_weight: float = 0.5
    a3_weight: float = 1.0
    a6_weight: float = 1.0
    a6_tolerance: float = 0.5
    non_sc_formula_weight: float = 0.5

    focal_gamma: float = 2.0
    label_smoothing: float = 0.1
    fraction_token_weight: float = 2.0

    # SupCon contrastive over latents (reference: losses/contrastive.py:33;
    # weight 0 on the reference's active path — enabling pulls same-family
    # latents together using the contrastive category labels)
    supcon_weight: float = 0.0
    supcon_temperature: float = 0.07

    # semantic-unit penalties (reference: losses/semantic_unit_loss.py:291;
    # available in the reference loss zoo, weight 0 on the active path)
    semantic_unit_weight: float = 0.0
    semantic_element_penalty: float = 5.0
    semantic_fraction_penalty: float = 3.0
    semantic_exact_penalty: float = 1.0

    use_length_weighting: bool = True
    length_weight_base: float = 8.0
    length_weight_alpha: float = 1.0
    use_element_count_weighting: bool = True
    element_count_base: float = 3.0
    element_count_beta: float = 0.5

    tc_huber_delta: float = 1.0
    tc_underpred_penalty: float = 1.5
    tc_relative_weight: float = 0.5
    tc_kelvin_weighting: bool = True
    tc_kelvin_weight_scale: float = 20.0
    tc_bin_weights: Tuple[Tuple[float, float], ...] = (
        (0.0, 1.0), (10.0, 1.5), (50.0, 2.0), (100.0, 2.5), (150.0, 3.0))
    tc_class_bins: Tuple[float, ...] = (0.0, 10.0, 50.0, 100.0)
    tc_mean: float = 0.0
    tc_std: float = 1.0
    tc_log_transform: bool = True

    use_z_norm_penalty: bool = True
    z_norm_target: float = 22.0
    z_norm_penalty_weight: float = 0.001


# ---------------------------------------------------------------------------
# primitive losses
# ---------------------------------------------------------------------------

def focal_ce_per_sample(logits: jnp.ndarray, targets: jnp.ndarray,
                        gamma: float, smoothing: float,
                        fraction_token_weight: float = 1.0) -> jnp.ndarray:
    """Focal CE with label smoothing + fraction upweighting, per-sample mean
    over non-PAD positions (reference: train_v12_clean.py:1208-1311)."""
    mask = (targets != PAD_ID).astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    tgt_p = jnp.exp(tgt_logp)
    focal_w = (1.0 - tgt_p) ** gamma
    if smoothing > 0:
        smooth = -logp.mean(axis=-1)
        per_tok = focal_w * ((1.0 - smoothing) * (-tgt_logp) + smoothing * smooth)
    else:
        per_tok = focal_w * (-tgt_logp)
    if fraction_token_weight != 1.0:
        w = jnp.where(targets >= FRACTION_TOKEN_START,
                      fraction_token_weight, 1.0)
        per_tok = per_tok * w
    return (per_tok * mask).sum(axis=1) / jnp.clip(mask.sum(axis=1), 1.0)


def tc_kelvin(tc_norm: jnp.ndarray, cfg: LossConfig) -> jnp.ndarray:
    x = tc_norm * cfg.tc_std + cfg.tc_mean
    if cfg.tc_log_transform:
        x = jnp.expm1(x)
    return jnp.clip(x, 0.0)


def tc_loss_per_sample(tc_pred: jnp.ndarray, tc_true: jnp.ndarray,
                       cfg: LossConfig) -> jnp.ndarray:
    """Huber + asymmetric underprediction + relative blend + bin/Kelvin
    weighting (reference: train_v12_clean.py:3149-3200)."""
    err = tc_pred - tc_true
    if cfg.tc_huber_delta > 0:
        d = cfg.tc_huber_delta
        a = jnp.abs(err)
        loss = jnp.where(a <= d, 0.5 * err ** 2, d * (a - 0.5 * d))
    else:
        loss = err ** 2
    if cfg.tc_underpred_penalty != 1.0:
        under = (tc_pred < tc_true).astype(loss.dtype)
        loss = loss * (1.0 + under * (cfg.tc_underpred_penalty - 1.0))
    k_true = tc_kelvin(tc_true, cfg)
    if cfg.tc_relative_weight > 0:
        k_pred = tc_kelvin(tc_pred, cfg)
        rel = jnp.abs(k_pred - k_true) / jnp.clip(k_true, 1.0)
        loss = (1.0 - cfg.tc_relative_weight) * loss + cfg.tc_relative_weight * rel
    # highest matching threshold wins: iterate ascending, overwrite
    bin_w = jnp.ones_like(k_true)
    for thr, w in sorted(cfg.tc_bin_weights):
        bin_w = jnp.where(k_true >= thr, w, bin_w)
    loss = loss * bin_w
    if cfg.tc_kelvin_weighting:
        loss = loss * (1.0 + k_true / cfg.tc_kelvin_weight_scale)
    return loss


def tc_class_targets(k_true: jnp.ndarray, bins) -> jnp.ndarray:
    """Kelvin -> bucket id: 0 for Tc<=0, then one per bin edge exceeded."""
    t = jnp.zeros_like(k_true, dtype=jnp.int32)
    for i, edge in enumerate(bins):
        t = jnp.where(k_true > edge, i + 1, t)
    return t


def masked_ce(logits: jnp.ndarray, targets: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over rows where valid (safe for empty selections)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    v = valid.astype(jnp.float32)
    return (nll * v).sum() / jnp.clip(v.sum(), 1.0)


def bce_logits(logits: jnp.ndarray, targets: jnp.ndarray,
               pos_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Elementwise BCE-with-logits (optionally positive-class weighted)."""
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    if pos_weight is not None:
        return -(pos_weight * targets * log_p + (1.0 - targets) * log_np)
    return -(targets * log_p + (1.0 - targets) * log_np)


def site_dup_targets(targets: jnp.ndarray) -> jnp.ndarray:
    """1.0 where the target token is an element token already emitted earlier
    in the sequence (reference: losses/site_dup_loss.py:14-112)."""
    t = targets.shape[1]
    elem = is_element_token(targets) & (targets != PAD_ID)
    same = targets[:, :, None] == targets[:, None, :]          # [B, T, T]
    earlier = jnp.tril(jnp.ones((t, t), bool), k=-1)[None]
    dup = (same & earlier & elem[:, None, :] & elem[:, :, None]).any(axis=2)
    return dup.astype(jnp.float32)


# ---------------------------------------------------------------------------
# full assembly
# ---------------------------------------------------------------------------

def semantic_unit_loss(
    pred: jnp.ndarray,           # [B, T] argmax token ids
    targets: jnp.ndarray,        # [B, T]
    mask: jnp.ndarray,           # [B, T] target validity (non-PAD)
    type_table: jnp.ndarray,     # [V] token -> type LUT
    element_penalty: float = 5.0,
    fraction_penalty: float = 3.0,
    exact_match_penalty: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Semantic-unit-level penalties on the decoded stream.

    Capability parity with the reference ``compute_semantic_loss``
    (reference: losses/semantic_unit_loss.py:205-346): compare the ORDERED
    element stream and the ordered amount stream of prediction vs target;
    errors = positional mismatches + |count difference|, normalized by the
    longer stream; plus a 0/1 non-exact-match penalty.  Argmax-based — a
    penalty signal, not a gradient path (as in the reference).

    TPU redesign: the reference parses each row into Python SemanticUnit
    lists; here the ordered unit streams are compacted on device with a
    stable argsort over the type LUT — one fused program, no host loop.
    Amount units = INTEGER|FRACTION tokens (the V14 fraction-native layout
    folds both into the reference's 'fraction' unit type).
    """
    from ..tokenizer import (TOKEN_TYPE_ELEMENT, TOKEN_TYPE_FRACTION,
                             TOKEN_TYPE_INTEGER)
    t = pred.shape[1]
    idx = jnp.arange(t)[None, :]
    # prediction stream is valid strictly before its first EOS
    pred_live = jnp.cumsum((pred == EOS_ID).astype(jnp.int32), axis=1) == 0
    tgt_live = mask & (targets != EOS_ID)
    tp = type_table[pred]
    tt = type_table[targets]

    def stream_err(unit_types):
        is_p = jnp.isin(tp, unit_types) & pred_live
        is_t = jnp.isin(tt, unit_types) & tgt_live
        # stable argsort of ~is_unit compacts unit positions to the front
        # in original order
        comp_p = jnp.take_along_axis(
            pred, jnp.argsort(~is_p, axis=1, stable=True), axis=1)
        comp_t = jnp.take_along_axis(
            targets, jnp.argsort(~is_t, axis=1, stable=True), axis=1)
        n_p = is_p.sum(axis=1)
        n_t = is_t.sum(axis=1)
        both = idx < jnp.minimum(n_p, n_t)[:, None]
        mism = ((comp_p != comp_t) & both).sum(axis=1)
        err = mism + jnp.abs(n_p - n_t)
        n = jnp.maximum(n_p, n_t)
        return jnp.where(n > 0, err / jnp.clip(n, 1), 0.0)

    elem_err = stream_err(jnp.asarray([TOKEN_TYPE_ELEMENT]))
    frac_err = stream_err(
        jnp.asarray([TOKEN_TYPE_INTEGER, TOKEN_TYPE_FRACTION]))
    exact_err = 1.0 - ((pred == targets) | ~mask).all(axis=1).astype(
        jnp.float32)

    element_loss = elem_err.mean() * element_penalty
    fraction_loss = frac_err.mean() * fraction_penalty
    exact_loss = exact_err.mean() * exact_match_penalty
    return {
        'element_loss': element_loss,
        'fraction_loss': fraction_loss,
        'exact_match_loss': exact_loss,
        'total': element_loss + fraction_loss + exact_loss,
    }


def multitask_loss(
    cfg: LossConfig,
    enc_out: Dict[str, jnp.ndarray],
    dec_out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    type_table: jnp.ndarray,                 # [V] token->type LUT
    rl_loss: Optional[jnp.ndarray] = None,   # scalar policy-gradient loss
    rl_reward_mean: Optional[jnp.ndarray] = None,
    tc_weight_override: Optional[float] = None,
    magpie_weight_override: Optional[float] = None,
    dyn: Optional[Dict[str, jnp.ndarray]] = None,
    physz_loss: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One pass over a (possibly mixed SC/non-SC) batch.

    Returns (total_loss, metrics).  Static term weights live in ``cfg``;
    per-epoch host-scheduler decisions (curriculum ramps, smart loss
    skipping, RL weight, physics-Z guard) arrive as TRACED scalars in
    ``dyn`` so weight changes never trigger recompilation:

      dyn keys (all optional, default 1.0 multiplier / pass-through):
        'tc_w', 'magpie_w'      — absolute curriculum weights
        'rl_w'                  — absolute RL weight
        'physz_w'               — absolute physics-Z weight
        'm_<term>'              — 0/1 skip multipliers for skippable terms
                                  (magpie, tc_class, hp, sc, stop, site_dup,
                                   family)
    """
    tokens = batch['tokens']
    targets = tokens[:, 1:]
    logits = dec_out['logits']
    b = tokens.shape[0]
    mask = (targets != PAD_ID)
    maskf = mask.astype(jnp.float32)
    is_sc = (batch['is_sc'] == 1).astype(jnp.float32)
    sc_any = jnp.clip(is_sc.sum(), 1.0)

    dyn = dyn or {}

    def mult(name):
        return dyn.get(f'm_{name}', 1.0)

    tc_w = dyn.get(
        'tc_w', cfg.tc_weight if tc_weight_override is None else tc_weight_override)
    mg_w = dyn.get(
        'magpie_w',
        cfg.magpie_weight if magpie_weight_override is None
        else magpie_weight_override)
    rl_w = dyn.get('rl_w', cfg.rl_weight)

    # ---- formula CE with per-sample A/D weights and SC/non-SC weighting ----
    per_sample_ce = focal_ce_per_sample(
        logits, targets, cfg.focal_gamma, cfg.label_smoothing,
        cfg.fraction_token_weight)
    sample_w = jnp.ones(b)
    if cfg.use_length_weighting:
        seq_len = maskf.sum(axis=1)
        sample_w = sample_w * (1.0 + cfg.length_weight_alpha * jnp.clip(
            (seq_len - cfg.length_weight_base) / cfg.length_weight_base, 0.0))
    if cfg.use_element_count_weighting:
        n_elem = batch['element_mask'].sum(axis=1).astype(jnp.float32)
        sample_w = sample_w * (1.0 + cfg.element_count_beta * jnp.clip(
            n_elem - cfg.element_count_base, 0.0))
    sc_row_w = jnp.where(is_sc > 0, 1.0, cfg.non_sc_formula_weight)
    formula_ce = (per_sample_ce * sample_w * sc_row_w).mean()

    # ---- Tc stack (SC rows only, scaled by SC fraction) --------------------
    tc_ps = tc_loss_per_sample(enc_out['tc_pred'], batch['tc'], cfg)
    tc_loss = (tc_ps * is_sc).mean()
    k_true = tc_kelvin(batch['tc'], cfg)
    tcc = masked_ce(enc_out['tc_class_logits'],
                    tc_class_targets(k_true, cfg.tc_class_bins), is_sc > 0)
    # tc_class is computed over SC rows; reference applies it inside the SC
    # branch, so scale by SC fraction for mixed batches
    tc_class_loss = tcc * (is_sc.sum() / b)

    # ---- Magpie / stoichiometry (SC rows) ----------------------------------
    mg_err = (enc_out['magpie_pred'] - batch['magpie']) ** 2
    magpie_loss = (mg_err.mean(axis=1) * is_sc).mean()

    em = batch['element_mask'].astype(jnp.float32)
    st_err = (enc_out['fraction_pred'] - batch['element_fractions']) ** 2 * em
    st_ps = st_err.sum(axis=1) / jnp.clip(em.sum(axis=1), 1.0)
    stoich_loss = (st_ps * is_sc).mean()
    cnt_err = (enc_out['element_count_pred'] - em.sum(axis=1)) ** 2
    count_loss = (cnt_err * is_sc).mean()

    # ---- z regularization --------------------------------------------------
    kl_loss = enc_out['kl_loss']
    z = enc_out['z']
    z_norm_penalty = jnp.asarray(0.0)
    if cfg.use_z_norm_penalty:
        excess = jnp.clip(jnp.linalg.norm(z, axis=1) - cfg.z_norm_target, 0.0)
        z_norm_penalty = (excess ** 2).mean()

    # ---- decoder auxiliary heads -------------------------------------------
    stop_t = (targets == EOS_ID).astype(jnp.float32)
    stop_bce = bce_logits(dec_out['stop_logits'], stop_t)
    if cfg.stop_end_position_weight > 1.0:
        stop_bce = stop_bce * jnp.where(stop_t > 0,
                                        cfg.stop_end_position_weight, 1.0)
    stop_loss = (stop_bce * maskf).sum() / jnp.clip(maskf.sum(), 1.0)

    type_t = type_table[jnp.clip(targets, 0, type_table.shape[0] - 1)]
    type_loss = masked_ce(dec_out['type_logits'], type_t, mask)
    type_pred = jnp.argmax(dec_out['type_logits'], axis=-1)
    type_acc = (((type_pred == type_t) & mask).sum()
                / jnp.clip(mask.sum(), 1))

    sd_t = site_dup_targets(targets)
    sd_bce = bce_logits(dec_out['site_dup_logits'], sd_t,
                        pos_weight=jnp.asarray(cfg.site_dup_pos_weight))
    site_dup_loss = (sd_bce * maskf).sum() / jnp.clip(maskf.sum(), 1.0)

    # ---- encoder auxiliary heads -------------------------------------------
    # HP: SC rows only, dynamic pos_weight capped at 50
    hp_t = batch['hp'].astype(jnp.float32)
    n_pos = jnp.clip((hp_t * is_sc).sum(), 1.0)
    n_neg = jnp.clip(((1 - hp_t) * is_sc).sum(), 1.0)
    hp_pw = jnp.clip(n_neg / n_pos, 1.0, 50.0)
    hp_bce = bce_logits(enc_out['hp_pred'], hp_t, pos_weight=hp_pw)
    hp_loss = (hp_bce * is_sc).sum() / sc_any

    sc_loss = bce_logits(enc_out['sc_pred'], is_sc).mean()

    fam = jnp.clip(batch['family'], 0, 13)
    coarse_t = jnp.asarray(FINE_TO_COARSE)[fam]
    cup_t = jnp.asarray(FINE_TO_CUPRATE_SUB)[fam]
    iron_t = jnp.asarray(FINE_TO_IRON_SUB)[fam]
    sc_rows = is_sc > 0
    coarse_loss = masked_ce(enc_out['family_coarse_logits'], coarse_t,
                            sc_rows & (coarse_t >= 0))
    cup_loss = masked_ce(enc_out['family_cuprate_sub_logits'], cup_t,
                         sc_rows & (coarse_t == 1) & (cup_t >= 0))
    iron_loss = masked_ce(enc_out['family_iron_sub_logits'], iron_t,
                          sc_rows & (coarse_t == 2) & (iron_t >= 0))
    family_loss = (cfg.family_coarse_weight * coarse_loss
                   + cfg.family_cuprate_weight * cup_loss
                   + cfg.family_iron_weight * iron_loss)

    # ---- constraint zoo (differentiable A3/A6) -----------------------------
    zoo = jnp.asarray(0.0)
    if cfg.constraint_zoo_weight > 0:
        a3 = site_occupancy_loss(
            batch['element_indices'], batch['element_fractions'],
            batch['element_mask'], enc_out.get('family_composed_14'))
        a6 = charge_balance_loss(
            batch['element_indices'], batch['element_fractions'],
            batch['element_mask'], tolerance=cfg.a6_tolerance)
        zoo = cfg.a3_weight * a3 + cfg.a6_weight * a6

    # ---- policy gradient ---------------------------------------------------
    rl = rl_loss if rl_loss is not None else jnp.asarray(0.0)

    pz = physz_loss if physz_loss is not None else jnp.asarray(0.0)
    total = (
        cfg.ce_weight * formula_ce
        + rl_w * rl
        + tc_w * tc_loss
        + mg_w * mult('magpie') * magpie_loss
        + cfg.kl_weight * kl_loss
        + cfg.stoich_weight * stoich_loss
        + cfg.element_count_weight * count_loss
        + cfg.tc_class_weight * mult('tc_class') * tc_class_loss
        + cfg.constraint_zoo_weight * zoo
        + cfg.z_norm_penalty_weight * z_norm_penalty
        + cfg.stop_loss_weight * mult('stop') * stop_loss
        + cfg.token_type_loss_weight * type_loss
        + cfg.site_dup_loss_weight * mult('site_dup') * site_dup_loss
        + cfg.hp_loss_weight * mult('hp') * hp_loss
        + cfg.sc_loss_weight * mult('sc') * sc_loss
        + cfg.family_loss_weight * mult('family') * family_loss
        + dyn.get('physz_w', 0.0) * mult('physics_z') * pz
    )

    # ---- SupCon contrastive (static-gated: zero compute when off) ----------
    if cfg.supcon_weight > 0 and 'label' in batch:
        from .aux_losses import supcon_loss
        total = total + cfg.supcon_weight * supcon_loss(
            enc_out['z'], batch['label'], cfg.supcon_temperature)

    # ---- metrics -----------------------------------------------------------
    pred = jnp.argmax(logits, axis=-1)
    sem = jnp.asarray(0.0)
    if cfg.semantic_unit_weight > 0:
        sem = semantic_unit_loss(
            pred, targets, mask, type_table,
            cfg.semantic_element_penalty, cfg.semantic_fraction_penalty,
            cfg.semantic_exact_penalty)['total']
        total = total + cfg.semantic_unit_weight * sem
    correct = (pred == targets) & mask
    token_acc = correct.sum() / jnp.clip(mask.sum(), 1)
    exact = (correct | ~mask).all(axis=1).astype(jnp.float32).mean()
    probs = jnp.clip(jax.nn.softmax(logits.astype(jnp.float32), axis=-1), 1e-8)
    ent = (-(probs * jnp.log(probs)).sum(-1) * maskf).sum(1)
    entropy = ent.mean()

    metrics = {
        'total': total, 'formula_loss': formula_ce, 'reinforce_loss': rl,
        'tc_loss': tc_loss, 'magpie_loss': magpie_loss,
        'stoich_loss': stoich_loss, 'count_loss': count_loss,
        'kl_loss': kl_loss, 'tc_class_loss': tc_class_loss,
        'z_norm_penalty': z_norm_penalty, 'stop_loss': stop_loss,
        'type_loss': type_loss, 'type_accuracy': type_acc,
        'site_dup_loss': site_dup_loss, 'hp_loss': hp_loss,
        'sc_loss': sc_loss, 'family_loss': family_loss,
        'constraint_zoo_loss': zoo, 'physics_z_loss': pz,
        'semantic_unit_loss': sem,
        'token_accuracy': token_acc,
        'exact_match': exact, 'entropy': entropy,
        'mean_reward': (rl_reward_mean if rl_reward_mean is not None
                        else jnp.asarray(0.0)),
    }
    return total, metrics
