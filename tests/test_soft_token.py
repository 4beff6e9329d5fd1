"""Soft-token scheduled sampling (training/soft_token.py).

Reference: training/soft_token_sampling.py:44-391 — ratio schedules,
soft-embedding mixer, two-pass decoder forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.models.decoder import FormulaDecoder
from superconductor_vae_tpu.training.soft_token import (
    SoftTokenSchedule, mix_embeddings, soft_token_forward, soft_token_ratio,
)


@pytest.fixture(scope='module')
def decoder_setup():
    cfg = tiny_test_config()
    dec = FormulaDecoder(cfg)
    rng = jax.random.PRNGKey(0)
    b, t = 4, cfg.max_len
    z = jax.random.normal(rng, (b, cfg.latent_dim))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0,
                                cfg.vocab_size)
    stoich = jnp.zeros((b, cfg.stoich_input_dim))
    hv = jnp.zeros((b, cfg.heads_input_dim))
    params = dec.init(rng, z, tokens, stoich, hv)
    return cfg, dec, params, z, tokens, stoich, hv


class TestSchedule:
    def test_warmup_holds_start(self):
        cfg = SoftTokenSchedule(n_epochs=100, start_ratio=0.0, end_ratio=0.5,
                                warmup_epochs=10)
        assert soft_token_ratio(0, cfg) == 0.0
        assert soft_token_ratio(9, cfg) == 0.0

    @pytest.mark.parametrize('schedule', ['linear', 'cosine', 'exponential'])
    def test_monotonic_to_end(self, schedule):
        cfg = SoftTokenSchedule(n_epochs=50, start_ratio=0.1, end_ratio=0.5,
                                schedule=schedule)
        vals = [soft_token_ratio(e, cfg) for e in range(60)]
        assert vals[0] == pytest.approx(0.1)
        assert vals[-1] == pytest.approx(0.5)
        assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))

    def test_linear_midpoint(self):
        cfg = SoftTokenSchedule(n_epochs=100, start_ratio=0.0, end_ratio=0.4)
        assert soft_token_ratio(50, cfg) == pytest.approx(0.2)

    def test_unknown_schedule_raises(self):
        with pytest.raises(ValueError):
            soft_token_ratio(
                1, SoftTokenSchedule(schedule='quadratic'))


class TestMixer:
    def test_ratio_zero_is_hard(self):
        hard = jnp.ones((2, 3, 4))
        soft = jnp.full((2, 3, 4), 5.0)
        np.testing.assert_allclose(mix_embeddings(hard, soft, 0.0), hard)

    def test_ratio_one_is_soft(self):
        hard = jnp.ones((2, 3, 4))
        soft = jnp.full((2, 3, 4), 5.0)
        np.testing.assert_allclose(mix_embeddings(hard, soft, 1.0), soft)

    def test_position_mask_restricts(self):
        hard = jnp.zeros((1, 3, 2))
        soft = jnp.ones((1, 3, 2))
        mask = jnp.asarray([[True, False, True]])
        out = mix_embeddings(hard, soft, 1.0, position_mask=mask)
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), [1.0, 0.0, 1.0])


class TestSoftTokenForward:
    def test_ratio_zero_matches_teacher_forcing(self, decoder_setup):
        cfg, dec, params, z, tokens, stoich, hv = decoder_setup
        tf = dec.apply(params, z, tokens, stoich, hv)
        out = soft_token_forward(dec, params, z, tokens, stoich, hv,
                                 soft_ratio=0.0)
        np.testing.assert_allclose(np.asarray(out['logits']),
                                   np.asarray(tf['logits']),
                                   rtol=1e-5, atol=1e-5)

    def test_ratio_changes_logits_with_same_shapes(self, decoder_setup):
        cfg, dec, params, z, tokens, stoich, hv = decoder_setup
        tf = dec.apply(params, z, tokens, stoich, hv)
        out = soft_token_forward(dec, params, z, tokens, stoich, hv,
                                 soft_ratio=0.5)
        assert out['logits'].shape == tf['logits'].shape
        assert out['stop_logits'].shape == tf['stop_logits'].shape
        assert not np.allclose(np.asarray(out['logits']),
                               np.asarray(tf['logits']))

    def test_jittable_with_traced_ratio(self, decoder_setup):
        cfg, dec, params, z, tokens, stoich, hv = decoder_setup

        @jax.jit
        def run(r):
            return soft_token_forward(dec, params, z, tokens, stoich, hv,
                                      soft_ratio=r)['logits']

        a = run(jnp.asarray(0.2))
        b = run(jnp.asarray(0.8))  # no recompile needed, traced scalar
        assert a.shape == b.shape
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_gradients_flow_through_second_pass(self, decoder_setup):
        cfg, dec, params, z, tokens, stoich, hv = decoder_setup

        def loss(p):
            out = soft_token_forward(dec, p, z, tokens, stoich, hv,
                                     soft_ratio=0.5)
            return jnp.mean(out['logits'] ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_train_step_with_soft_tokens(self):
        # one full jitted train step with the gated path on: loss finite,
        # params update
        import numpy as np
        from superconductor_vae_tpu.data import synthetic_dataset
        from superconductor_vae_tpu.tokenizer import default_tokenizer
        from superconductor_vae_tpu.training import TrainConfig
        from superconductor_vae_tpu.training.train_step import (
            build_luts, create_train_state, default_dyn, make_train_step,
        )
        mcfg = tiny_test_config()
        tcfg = TrainConfig(batch_size=4, max_formula_len=mcfg.max_len,
                           use_physics_z=False,
                           soft_token_enabled=True,
                           soft_token_start_ratio=0.3)
        rng = jax.random.PRNGKey(0)
        encoder, decoder, state, tx_enc, tx_dec = create_train_state(
            mcfg, tcfg, rng)
        tok = default_tokenizer(max_len=mcfg.max_len)
        step = make_train_step(encoder, decoder, tcfg, tx_enc, tx_dec,
                               build_luts(tok), rl_enabled=False,
                               donate=False)
        ds = synthetic_dataset(n=4, max_len=mcfg.max_len,
                               magpie_dim=mcfg.magpie_dim)
        batch = {k: jnp.asarray(v) for k, v in
                 ds.batch(np.arange(4)).items()}
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                                  default_dyn(tcfg))
        assert np.isfinite(float(metrics['total']))
        before = jax.tree.leaves(state.dec_params)[0]
        after = jax.tree.leaves(new_state.dec_params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_bos_position_always_hard(self, decoder_setup):
        # the soft mixture at position 0 is the hard BOS embedding, so a
        # full-soft forward with uniform first-pass logits still sees BOS
        cfg, dec, params, z, tokens, stoich, hv = decoder_setup
        out_soft = soft_token_forward(dec, params, z, tokens, stoich, hv,
                                      soft_ratio=1.0)
        # first-position logits depend only on BOS + memory, identical to TF
        tf = dec.apply(params, z, tokens, stoich, hv)
        np.testing.assert_allclose(np.asarray(out_soft['logits'][:, 0]),
                                   np.asarray(tf['logits'][:, 0]),
                                   rtol=1e-4, atol=1e-4)
