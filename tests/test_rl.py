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
    loss, reward, ent = jax.jit(
        lambda p, r: scst_loss(dec, p, z, stoich, heads_vec, targets, r,
                               cfg, luts))(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(reward))
    assert float(ent) >= 0


def test_rloo(setup):
    dec, params, z, stoich, heads_vec, targets, luts = setup
    cfg = RLConfig(method='rloo', n_samples_rloo=3, max_len=CFG.max_len,
                   use_type_masking=False)
    loss, reward, ent = jax.jit(
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
        loss, _, _ = scst_loss(dec, p, z, stoich, heads_vec, targets,
                               jax.random.PRNGKey(3), cfg, luts)
        return loss

    grads = jax.jit(jax.grad(fn))(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0  # nonzero gradient signal
