"""Jitted multi-task train step, data-parallel over a device mesh.

Replaces the reference's eager per-batch loop body
(reference: scripts/train_v12_clean.py:5074-5925 ``train_epoch``) with ONE
compiled program per step: encoder forward, decoder TF forward, optional
SCST/RLOO rollouts, 17-term loss, gradients, and two AdamW updates — all
under ``jax.jit`` with donated state.  Parameters are replicated and batches
sharded on the mesh ``data`` axis; GSPMD inserts the gradient all-reduce over
ICI (the reference has no distributed path at all, SURVEY.md §2.10).

Host-scheduler decisions (curriculum weights, loss skipping, RL weight /
temperature / entropy weight, physics-Z weight, learning-rate scale) enter as
a dict of TRACED scalars so per-epoch changes never recompile.  The only
recompile boundary is ``rl_enabled`` (rollouts on/off), which changes the
program structure.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models import MaterialsEncoder, FormulaDecoder
from ..models.config import ModelConfig
from ..ops.losses import LossConfig, multitask_loss
from ..ops.physics_z_loss import physics_z_loss
from ..ops.rl import RLConfig, rloo_loss, scst_loss
from ..tokenizer import FractionAwareTokenizer
from .config import TrainConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    enc_params: Any
    dec_params: Any
    enc_opt: Any
    dec_opt: Any
    set_params: Any = None     # V16 Hungarian set decoder (parallel path)
    set_opt: Any = None
    pz_params: Any = None      # learnable Magpie projection in PhysicsZLoss
    pz_opt: Any = None         # (reference: z_supervision_loss.py:52-76)


def build_luts(tokenizer: FractionAwareTokenizer) -> Dict[str, jnp.ndarray]:
    return {
        'fraction_values': jnp.asarray(tokenizer.fraction_value_table),
        'token_value_table': jnp.asarray(tokenizer.token_value_table),
        'token_to_z': jnp.asarray(tokenizer.token_to_element_z),
        'type_masks': jnp.asarray(tokenizer.type_masks),
        'type_table': jnp.asarray(tokenizer.token_type_table),
    }


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with global-norm clipping; LR is an injected hyperparam so the
    host LR schedule (cosine + warmup + rollback halving + migration boost)
    updates it in the optimizer state without recompiling.  Gradient
    accumulation (reference: accumulation_steps, train_v12_clean.py:430)
    wraps the chain in optax.MultiSteps."""
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=tcfg.learning_rate,
            weight_decay=tcfg.weight_decay),
    )
    if tcfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.accumulation_steps)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR in an optimizer state pytree (handles the
    MultiSteps wrapper)."""
    inner = getattr(opt_state, 'inner_opt_state', opt_state)
    inner[1].hyperparams['learning_rate'] = jnp.asarray(lr, jnp.float32)
    return opt_state


def stoich_conditioning(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """[B, 13] = GT fractions(12) + element count(1).

    The reference trains with stoich_cond_tf = 1.0 (always ground truth,
    train_v12_clean.py:464); inference uses the encoder's fraction head.
    """
    em = batch['element_mask'].astype(jnp.float32)
    count = em.sum(axis=1, keepdims=True)
    return jnp.concatenate(
        [batch['element_fractions'] * em, count], axis=1)


def create_train_state(
    mcfg: ModelConfig, tcfg: TrainConfig, rng: jax.Array,
    dtype=jnp.float32,
) -> Tuple[MaterialsEncoder, FormulaDecoder, TrainState,
           optax.GradientTransformation, optax.GradientTransformation]:
    encoder = MaterialsEncoder(mcfg, dtype=dtype)
    decoder = FormulaDecoder(mcfg, dtype=dtype)
    set_decoder = make_set_decoder(mcfg, tcfg, dtype) \
        if tcfg.hungarian_enabled else None

    e_rng, d_rng = jax.random.split(rng)
    b = 2
    # jit the inits: eager init of a 108M model dispatches thousands of ops
    # individually (minutes over the TPU tunnel); one compiled program is
    # near-instant
    enc_params = jax.jit(encoder.init)(
        e_rng,
        jnp.zeros((b, mcfg.max_elements), jnp.int32),
        jnp.zeros((b, mcfg.max_elements)),
        jnp.zeros((b, mcfg.max_elements), bool),
        jnp.zeros((b, mcfg.magpie_dim)),
        jnp.zeros((b,)),
    )
    dec_params = jax.jit(decoder.init)(
        d_rng,
        jnp.zeros((b, mcfg.latent_dim)),
        jnp.zeros((b, mcfg.max_len), jnp.int32),
        jnp.zeros((b, mcfg.stoich_input_dim)),
        jnp.zeros((b, mcfg.heads_input_dim)),
    )
    set_params = None
    set_opt = None
    tx_enc = make_optimizer(tcfg)
    tx_dec = make_optimizer(tcfg)
    if set_decoder is not None:
        set_params = jax.jit(set_decoder.init)(
            jax.random.fold_in(rng, 2), jnp.zeros((b, mcfg.latent_dim)))
        set_opt = jax.jit(tx_dec.init)(set_params)
    pz_params = None
    pz_opt = None
    if tcfg.use_physics_z and tcfg.magpie_proj_learnable:
        from ..ops.physics_z_loss import init_magpie_proj
        pz_params = init_magpie_proj(
            jax.random.fold_in(rng, 3), mcfg.magpie_dim)
        pz_opt = tx_enc.init(pz_params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        enc_params=enc_params, dec_params=dec_params,
        enc_opt=jax.jit(tx_enc.init)(enc_params),
        dec_opt=jax.jit(tx_dec.init)(dec_params),
        set_params=set_params, set_opt=set_opt,
        pz_params=pz_params, pz_opt=pz_opt,
    )
    return encoder, decoder, state, tx_enc, tx_dec


def make_set_decoder(mcfg: ModelConfig, tcfg: TrainConfig, dtype=jnp.float32):
    from ..models.set_decoder import SetFormulaDecoder
    return SetFormulaDecoder(
        latent_dim=mcfg.latent_dim,
        d_model=tcfg.hungarian_d_model,
        num_layers=tcfg.hungarian_num_layers,
        dim_feedforward=tcfg.hungarian_dim_feedforward,
        n_slots=mcfg.max_elements,
        n_z_tokens=tcfg.hungarian_n_z_tokens,
        dtype=dtype,
    )


def default_dyn(tcfg: TrainConfig) -> Dict[str, jnp.ndarray]:
    return {
        'tc_w': jnp.asarray(tcfg.tc_weight),
        'magpie_w': jnp.asarray(tcfg.magpie_weight),
        'rl_w': jnp.asarray(tcfg.rl_weight),
        'physz_w': jnp.asarray(0.0),
        'rl_temperature': jnp.asarray(tcfg.rl.temperature),
        'entropy_weight': jnp.asarray(tcfg.rl.entropy_weight),
        'm_magpie': jnp.asarray(1.0), 'm_tc_class': jnp.asarray(1.0),
        'm_hp': jnp.asarray(1.0), 'm_sc': jnp.asarray(1.0),
        'm_stop': jnp.asarray(1.0), 'm_site_dup': jnp.asarray(1.0),
        'm_family': jnp.asarray(1.0), 'm_physics_z': jnp.asarray(1.0),
        'soft_ratio': jnp.asarray(tcfg.soft_token_start_ratio),
    }


def _build_step_fn(
    encoder: MaterialsEncoder,
    decoder: FormulaDecoder,
    tcfg: TrainConfig,
    tx_enc: optax.GradientTransformation,
    tx_dec: optax.GradientTransformation,
    luts: Dict[str, jnp.ndarray],
    rl_enabled: bool = False,
):
    """Unjitted ``step(state, batch, rng, dyn) -> (state, metrics)``;
    jitted directly by ``make_train_step`` and scanned over a whole epoch by
    ``make_epoch_runner``."""
    lcfg = tcfg.loss
    rlcfg = tcfg.rl
    set_decoder = (make_set_decoder(decoder.cfg, tcfg, decoder.dtype)
                   if tcfg.hungarian_enabled else None)

    pz_learnable = tcfg.use_physics_z and tcfg.magpie_proj_learnable

    # bf16 compute: cast model outputs up at the loss boundary so softmax /
    # log-prob / MSE numerics stay fp32 (standard TPU mixed precision)
    if encoder.dtype == jnp.float32:
        _f32 = lambda t: t
    else:
        _f32 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    def loss_fn(enc_params, dec_params, set_params, pz_params, batch, rng, dyn):
        drop_rng, rl_rng = jax.random.split(rng)
        enc_out = encoder.apply(
            enc_params, batch['element_indices'], batch['element_fractions'],
            batch['element_mask'], batch['magpie'], batch['tc'],
            deterministic=False, rngs={'dropout': drop_rng})
        heads_vec = encoder.apply(
            enc_params, enc_out, method=MaterialsEncoder.heads_pred_for_decoder)
        stoich = stoich_conditioning(batch)
        if tcfg.soft_token_enabled:
            # soft-token scheduled sampling: two-pass forward where the
            # second pass sees probability-weighted embedding mixtures;
            # ratio rides dyn as a traced scalar so the epoch ramp shares
            # one compile (training/soft_token.py; reference:
            # soft_token_sampling.py:230-360)
            from .soft_token import soft_token_forward
            dec_out = soft_token_forward(
                decoder, dec_params, enc_out['z'], batch['tokens'], stoich,
                heads_vec, soft_ratio=dyn['soft_ratio'],
                temperature=tcfg.soft_token_temperature,
                rngs={'dropout': drop_rng}, deterministic=False)
        else:
            dec_out = decoder.apply(
                dec_params, enc_out['z'], batch['tokens'], stoich, heads_vec,
                deterministic=False, rngs={'dropout': drop_rng})
        enc_out = _f32(enc_out)
        dec_out = _f32(dec_out)

        rl = None
        reward_mean = None
        if rl_enabled:
            targets = batch['tokens'][:, 1:]
            is_sc = (batch['is_sc'] == 1).astype(jnp.float32)
            rl_fn = scst_loss if rlcfg.method == 'scst' else rloo_loss
            kwargs = dict(
                family_predictions=enc_out['family_composed_14'],
                sc_weight=is_sc,
                temperature=dyn['rl_temperature'],
            )
            if rlcfg.method == 'rloo':
                kwargs['entropy_weight'] = dyn['entropy_weight']
            if 'entropy_pos_w' in dyn:
                kwargs['position_entropy_w'] = dyn['entropy_pos_w']
            # The rollouts inside rl_fn run on frozen params (forward-only
            # scans, no residuals) and the REINFORCE log-probs come from a
            # parallel TF re-score that is itself jax.checkpoint'ed inside
            # ops/rl.py — so no outer remat: it would only recompute the
            # gradient-free rollouts during backward.
            rl, reward_mean, _, rl_extras = rl_fn(
                decoder, dec_params, enc_out['z'], stoich, heads_vec,
                targets, rl_rng, rlcfg, luts, **kwargs)

        pz = None
        if tcfg.use_physics_z:
            pz = physics_z_loss(
                enc_out['z'], batch['comp_targets'], batch['magpie'],
                batch['tc'], proj_params=pz_params)['total']

        total, metrics = multitask_loss(
            lcfg, enc_out, dec_out, batch, luts['type_table'],
            rl_loss=rl, rl_reward_mean=reward_mean, dyn=dyn, physz_loss=pz)
        if rl_enabled:
            metrics['reward_var'] = rl_extras['reward_var']

        # A5 round-trip cycle consistency on a subset (zoo default ON in the
        # reference, train_v12_clean.py:968-972)
        if tcfg.use_round_trip and tcfg.a5_weight > 0:
            from ..ops.round_trip import round_trip_loss
            subset = max(int(batch['tokens'].shape[0]
                             * tcfg.round_trip_subset_fraction), 1)
            rt = round_trip_loss(
                encoder, enc_params, decoder, dec_params,
                enc_out['z'], stoich, heads_vec,
                enc_out['magpie_pred'], enc_out['tc_pred'],
                luts, jax.random.fold_in(rng, 5), subset,
                z_weight=tcfg.a5_z_weight, tc_weight=tcfg.a5_tc_weight,
                max_len=decoder.cfg.max_len)
            total = total + (lcfg.constraint_zoo_weight * tcfg.a5_weight
                             * rt['round_trip_loss'])
            metrics['a5_z_mse'] = rt['z_mse']
            metrics['a5_tc_mse'] = rt['tc_mse']
            metrics['total'] = total

        # theory regularization (reference keeps it computed at weight 0)
        if tcfg.use_theory_loss:
            from ..ops.losses import tc_kelvin
            from ..ops.theory import theory_loss
            th = theory_loss(
                tc_kelvin(enc_out['tc_pred'], lcfg), batch['family'],
                batch['element_fractions'], batch['element_indices'],
                batch['element_mask'])
            total = total + dyn.get('theory_w', tcfg.theory_weight) * th['total']
            metrics['theory_loss'] = th['total']
            metrics['total'] = total

        # V16 Hungarian set decoder — parallel path on the same z
        if set_decoder is not None:
            z_for_set = (jax.lax.stop_gradient(enc_out['z'])
                         if tcfg.hungarian_mode == 'set_only' else enc_out['z'])
            set_out = _f32(set_decoder.apply(
                set_params, z_for_set, deterministic=False,
                rngs={'dropout': drop_rng}))
            from ..ops.hungarian import hungarian_matching_loss
            h = hungarian_matching_loss(
                set_out['element_logits'], set_out['fraction_pred'],
                set_out['presence_logits'], batch['element_indices'],
                batch['element_fractions'], batch['element_mask'],
                element_weight=tcfg.hungarian_element_weight,
                fraction_weight=tcfg.hungarian_fraction_weight,
                no_object_weight=tcfg.hungarian_no_object_weight,
                presence_weight=tcfg.hungarian_presence_weight)
            total = total + tcfg.hungarian_loss_weight * h['total']
            metrics['hungarian_loss'] = h['total']
            metrics['set_element_accuracy'] = h['element_accuracy']
            metrics['set_exact'] = h['set_exact']
            metrics['total'] = total
        return total, metrics

    def step(state: TrainState, batch, rng, dyn):
        rng = jax.random.fold_in(rng, state.step)
        argnums = [0, 1]
        if set_decoder is not None:
            argnums.append(2)
        if pz_learnable:
            argnums.append(3)
        grad_fn = jax.value_and_grad(loss_fn, argnums=tuple(argnums),
                                     has_aux=True)
        (_, metrics), grads = grad_fn(
            state.enc_params, state.dec_params, state.set_params,
            state.pz_params, batch, rng, dyn)
        g_enc, g_dec = grads[0], grads[1]
        g_set = grads[2] if set_decoder is not None else None
        g_pz = grads[-1] if pz_learnable else None
        upd_e, new_eopt = tx_enc.update(g_enc, state.enc_opt, state.enc_params)
        upd_d, new_dopt = tx_dec.update(g_dec, state.dec_opt, state.dec_params)
        new_state = state.replace(
            step=state.step + 1,
            enc_params=optax.apply_updates(state.enc_params, upd_e),
            dec_params=optax.apply_updates(state.dec_params, upd_d),
            enc_opt=new_eopt, dec_opt=new_dopt,
        )
        if g_set is not None:
            upd_s, new_sopt = tx_dec.update(g_set, state.set_opt,
                                            state.set_params)
            new_state = new_state.replace(
                set_params=optax.apply_updates(state.set_params, upd_s),
                set_opt=new_sopt)
        if g_pz is not None:
            upd_p, new_popt = tx_enc.update(g_pz, state.pz_opt,
                                            state.pz_params)
            new_state = new_state.replace(
                pz_params=optax.apply_updates(state.pz_params, upd_p),
                pz_opt=new_popt)
        metrics['grad_norm'] = optax.global_norm((g_enc, g_dec))
        return new_state, metrics

    return step


def make_train_step(
    encoder: MaterialsEncoder,
    decoder: FormulaDecoder,
    tcfg: TrainConfig,
    tx_enc: optax.GradientTransformation,
    tx_dec: optax.GradientTransformation,
    luts: Dict[str, jnp.ndarray],
    rl_enabled: bool = False,
    donate: bool = True,
):
    """Returns jitted ``step(state, batch, rng, dyn) -> (state, metrics)``."""
    step = _build_step_fn(encoder, decoder, tcfg, tx_enc, tx_dec, luts,
                          rl_enabled=rl_enabled)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_epoch_runner(
    encoder: MaterialsEncoder,
    decoder: FormulaDecoder,
    tcfg: TrainConfig,
    tx_enc: optax.GradientTransformation,
    tx_dec: optax.GradientTransformation,
    luts: Dict[str, jnp.ndarray],
    rl_enabled: bool = False,
    mesh=None,
):
    """One compiled program per EPOCH instead of per step.

    ``lax.scan``s the train step over a ``[n_batches, B]`` index matrix,
    gathering each batch on-device from a device-resident dataset dict (the
    full dataset is tiny next to HBM).  Per epoch, the host transfers only
    the int32 indices and dispatches ONE program — the per-step host RTT
    that dominates small-batch training over the remote-TPU tunnel
    disappears, and steps run back-to-back on device.

    The reference has no analogue (its DataLoader feeds the GPU per batch,
    train_v12_clean.py:2251-2262); this is the TPU-idiomatic input path for
    datasets that fit in HBM.

    Returns jitted ``run(state, data, idx_mat, rng, dyn) -> (state, sums)``
    where ``sums`` holds per-metric SUMS over the epoch's steps (divide by
    ``n_batches`` on host).  ``data``/``idx_mat`` are arguments, never
    closed-over constants (remote-compile program-size limits).
    """
    step = _build_step_fn(encoder, decoder, tcfg, tx_enc, tx_dec, luts,
                          rl_enabled=rl_enabled)
    sharding = None
    if mesh is not None:
        from ..parallel.mesh import data_sharding
        sharding = data_sharding(mesh)

    def run(state: TrainState, data, idx_mat, rng, dyn):
        def body(carry, idx):
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            if sharding is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, jax.tree.map(lambda _: sharding, batch))
            new_state, metrics = step(carry, batch, rng, dyn)
            return new_state, metrics

        state, stacked = jax.lax.scan(body, state, idx_mat)
        return state, jax.tree.map(lambda m: m.sum(0), stacked)

    return jax.jit(run, donate_argnums=(0,))
