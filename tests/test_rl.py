"""SCST / RLOO policy-gradient tests on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.models import FormulaDecoder
from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.ops.rl import RLConfig, scst_loss, rloo_loss
from superconductor_vae_tpu.tokenizer import default_tokenizer

CFG = tiny_test_config()
B = 3


@pytest.fixture(scope='module')
def setup():
    tok = default_tokenizer(max_len=CFG.max_len)
    luts = {
        'fraction_values': jnp.asarray(tok.fraction_value_table),
        'token_value_table': jnp.asarray(tok.token_value_table),
        'token_to_z': jnp.asarray(tok.token_to_element_z),
        'type_masks': jnp.asarray(tok.type_masks),
    }
    dec = FormulaDecoder(CFG)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (B, CFG.latent_dim))
    stoich = jax.random.normal(rng, (B, CFG.stoich_input_dim))
    heads_vec = jax.random.normal(rng, (B, CFG.heads_input_dim))
    tokens = tok.encode_batch(['YBa2Cu3O7', 'MgB2', 'Nb3Sn'])
    targets = jnp.asarray(tokens[:, 1:CFG.max_len], jnp.int32)
    params = dec.init(rng, z, jnp.asarray(tokens[:, :CFG.max_len]),
                      stoich, heads_vec)
    return dec, params, z, stoich, heads_vec, targets, luts


def test_scst(setup):
    dec, params, z, stoich, heads_vec, targets, luts = setup
    cfg = RLConfig(method='scst', max_len=CFG.max_len, use_type_masking=False)
    loss, reward, ent, extras = jax.jit(
        lambda p, r: scst_loss(dec, p, z, stoich, heads_vec, targets, r,
                               cfg, luts))(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(reward))
    assert float(ent) >= 0
    assert float(extras['reward_var']) >= 0


def test_rloo(setup):
    dec, params, z, stoich, heads_vec, targets, luts = setup
    cfg = RLConfig(method='rloo', n_samples_rloo=3, max_len=CFG.max_len,
                   use_type_masking=False)
    loss, reward, ent, extras = jax.jit(
        lambda p, r: rloo_loss(dec, p, z, stoich, heads_vec, targets, r,
                               cfg, luts))(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(reward))


def test_scst_gradients(setup):
    """Policy gradient must flow into decoder params through log-probs."""
    dec, params, z, stoich, heads_vec, targets, luts = setup
    cfg = RLConfig(method='scst', max_len=CFG.max_len, use_type_masking=False,
                   use_constraint_rewards=False)

    def fn(p):
        loss, _, _, _ = scst_loss(dec, p, z, stoich, heads_vec, targets,
                                  jax.random.PRNGKey(3), cfg, luts)
        return loss

    grads = jax.jit(jax.grad(fn))(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0  # nonzero gradient signal


def test_novelty_bonus_and_position_weights(setup):
    """Novelty bonus rewards batch-unique rollouts; per-position entropy
    weights reshape exploration (reference: entropy_maintenance.py:650-845)."""
    from superconductor_vae_tpu.ops.reward import batch_novelty_bonus
    dec, params, z, stoich, heads_vec, targets, luts = setup
    tok3 = jnp.asarray([[5, 6, 7, 0], [5, 6, 7, 0], [9, 10, 11, 12]])
    m3 = (tok3 != 0).astype(jnp.float32)
    nb = batch_novelty_bonus(tok3, m3, 20, weight=0.5)
    assert float(nb[2]) > float(nb[0])

    cfg = RLConfig(method='scst', max_len=CFG.max_len, use_type_masking=False,
                   novelty_weight=0.1)
    pos_w = jnp.linspace(2.0, 0.5, targets.shape[1])
    loss, reward, ent, extras = jax.jit(
        lambda p, r: scst_loss(dec, p, z, stoich, heads_vec, targets, r,
                               cfg, luts, position_entropy_w=pos_w))(
        params, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(extras['reward_var']))


def test_rescore_matches_rollout_log_probs(setup):
    """The parallel TF re-score must reproduce the rollout's gated sampling
    log-probs exactly (same gates: type mask, stop/length boost, hard stop,
    degenerate guard, temperature) — the REINFORCE gradient path depends on
    this equivalence."""
    from superconductor_vae_tpu.generation.generate import (
        GenerationConfig, generate_with_kv_cache)
    from superconductor_vae_tpu.ops.rl import rescore_log_probs
    dec, params, z, stoich, heads_vec, targets, luts = setup
    for use_masking, site_dup in [(True, 0.0), (False, 0.0), (True, 0.5)]:
        cfg = RLConfig(method='scst', max_len=CFG.max_len,
                       use_type_masking=use_masking,
                       site_dup_threshold=site_dup,
                       stop_boost=10.0, hard_stop_threshold=0.8,
                       temperature=1.2)
        gcfg = GenerationConfig(
            max_len=cfg.max_len, temperature=cfg.temperature,
            stop_boost=cfg.stop_boost,
            hard_stop_threshold=cfg.hard_stop_threshold,
            site_dup_threshold=cfg.site_dup_threshold,
            use_type_masking=cfg.use_type_masking)
        out = generate_with_kv_cache(
            dec, params, z, stoich, heads_vec, jax.random.PRNGKey(7), gcfg,
            type_masks=luts['type_masks'] if use_masking else None)
        lp = rescore_log_probs(dec, params, z, stoich, heads_vec,
                               out['tokens'], cfg, luts)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(out['log_probs']),
            rtol=2e-4, atol=2e-4,
            err_msg=f'masking={use_masking} site_dup={site_dup}')


def test_per_position_weighter():
    from superconductor_vae_tpu.training.schedulers import (
        PerPositionEntropyWeighter)
    w = PerPositionEntropyWeighter(max_len=8, decay=0.0)
    errors = np.zeros((4, 8)); errors[:, 2] = 1      # all rows err at pos 2
    mask = np.ones((4, 8))
    w.update(errors, mask)
    weights = w.weights()
    assert weights[2] == max(weights)
    s = w.state_dict()
    w2 = PerPositionEntropyWeighter(max_len=8)
    w2.load_state_dict(s)
    np.testing.assert_allclose(w2.error_rates, w.error_rates)
