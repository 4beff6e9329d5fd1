"""A5 round-trip cycle consistency, fully on-device.

Capability parity with the reference ``RoundTripConsistencyLoss``
(reference: src/superconductor/losses/round_trip_loss.py:118-373): decode a
subset of latents greedily, re-encode the generated composition using the
predicted Magpie as proxy input, and penalize ``||z - z'||`` plus Tc MSE.

TPU redesign: the reference decodes, STRING-parses each formula on host, and
re-tokenizes.  Here the generated token stream is converted to composition
arrays ([B,12] element slots) entirely in-jit: one-hot element-amount
accumulation (ops/token_stats.py) followed by top-k slot selection — so the
whole round trip (decode scan -> composition -> re-encode) lives inside the
train step and back-propagates into the encoder through the re-encoding.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..generation.generate import GenerationConfig, generate_with_kv_cache
from ..models import MaterialsEncoder, FormulaDecoder
from .token_stats import element_amounts


def tokens_to_composition(tokens: jnp.ndarray, mask: jnp.ndarray,
                          token_to_z: jnp.ndarray,
                          token_value_table: jnp.ndarray,
                          max_elements: int = 12):
    """Token stream -> (element_indices, fractions, mask) slot arrays."""
    amounts = element_amounts(tokens, mask, token_to_z, token_value_table)
    amounts = amounts.at[:, 0].set(0.0)  # drop padding slot
    top_amt, top_z = jax.lax.top_k(amounts, max_elements)
    slot_mask = top_amt > 0
    total = jnp.clip((top_amt * slot_mask).sum(axis=1, keepdims=True), 1e-6)
    fractions = jnp.where(slot_mask, top_amt / total, 0.0)
    return top_z.astype(jnp.int32), fractions, slot_mask


def round_trip_loss(
    encoder: MaterialsEncoder, enc_params,
    decoder: FormulaDecoder, dec_params,
    z: jnp.ndarray, stoich: jnp.ndarray, heads_vec: jnp.ndarray,
    magpie_pred: jnp.ndarray, tc_pred: jnp.ndarray,
    luts: Dict[str, jnp.ndarray],
    rng: jax.Array,
    subset: int,
    z_weight: float = 1.0,
    tc_weight: float = 5.0,
    max_len: int = 30,
) -> Dict[str, jnp.ndarray]:
    """Returns {'round_trip_loss', 'z_mse', 'tc_mse'} on the first ``subset``
    rows (static subset size = reference's subset_fraction semantics)."""
    zs = z[:subset]
    gcfg = GenerationConfig(max_len=max_len, temperature=0.0)
    gen = generate_with_kv_cache(
        decoder, dec_params, jax.lax.stop_gradient(zs),
        jax.lax.stop_gradient(stoich[:subset]),
        jax.lax.stop_gradient(heads_vec[:subset]), rng, gcfg)
    e_idx, e_frac, e_mask = tokens_to_composition(
        gen['tokens'], gen['mask'], luts['token_to_z'],
        luts['token_value_table'], max_elements=encoder.cfg.max_elements)

    enc2 = encoder.apply(
        enc_params, e_idx, e_frac, e_mask,
        magpie_pred[:subset],            # predicted Magpie as proxy input
        tc_pred[:subset],
        method=MaterialsEncoder.encode)
    z2 = enc2['z']
    dec2 = encoder.apply(enc_params, z2, method=MaterialsEncoder.decode)

    z_mse = ((z2 - zs) ** 2).mean()
    tc_mse = ((dec2['tc_pred'] - tc_pred[:subset]) ** 2).mean()
    return {
        'round_trip_loss': z_weight * z_mse + tc_weight * tc_mse,
        'z_mse': z_mse, 'tc_mse': tc_mse,
    }
